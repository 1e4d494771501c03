#!/usr/bin/env python
"""Root-cause probe for the oracle's lidar-vs-ceiling gap (VERDICT r4 #4).

Round 4's overfit oracle sampled camera within 0.72 dB of its VAE ceiling
but lidar 8.57 dB below its own (report.json gate_headroom_db). This drive
loads the SAVED trained params from that run (trained_params.pkl + the VAE
phase checkpoint) and separates the candidate explanations with data:

  * latent_stats: per-modality std/mean of the scaled GT latents — a
    modality whose z0 std is far from 1 mismatches the N(0,1) prior the
    sampler starts from (the reference's 0.18215 scale factor was
    calibrated for the SD VAE's ~unit-std latents; a freshly-overfit VAE
    has no such guarantee).
  * sample_latent_mse: sampled-vs-GT latent MSE per modality, absolute
    and normalized by GT latent variance — large normalized lidar MSE
    means the DIFFUSION is missing the lidar latents; small latent MSE
    with poor pixel PSNR means the lidar DECODER amplifies latent error.

  /opt/venv/bin/python scripts/oracle_latent_diag.py \
      [--outdir logs/overfit_oracle] [--sample-steps 20]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/mobi_nusc-mini_256.yaml")
    p.add_argument("--outdir", default="logs/overfit_oracle")
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--sample-steps", type=int, default=20)
    opt = p.parse_args(argv)

    import jax

    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.overfit_oracle import (
        latent_stats,
        make_object_set,
        sample_latent_mse,
        vae_ceiling,
    )
    from mobi_tpu.utils.cache import enable_compilation_cache
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml

    enable_compilation_cache()
    cfg = load_config([opt.config], [])
    cfg["model"]["params"]["u_cond_percent"] = 0.0
    cfg["model"]["params"]["unet_config"]["params"].setdefault(
        "use_checkpoint", True
    )
    cfg["model"]["params"]["first_stage_config"]["params"].setdefault(
        "use_checkpoint", True
    )
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    path = os.path.join(opt.outdir, "trained_params.pkl")
    with open(path, "rb") as f:
        params = pickle.load(f)["params"]
    params = jax.device_put(params, dev)
    print(f"loaded trained params from {path}", flush=True)

    batch = make_object_set(
        opt.objects, mcfg.image_height, mcfg.image_width, seed=0,
        ref_hw=(mcfg.ref_image_size, mcfg.ref_image_size),
    )

    t0 = time.time()
    stats = latent_stats(model, params, batch)
    print(f"latent stats ({time.time() - t0:.0f}s): "
          f"{ {k: round(v, 3) for k, v in stats.items()} }", flush=True)

    t0 = time.time()
    ceiling = vae_ceiling(model, params, batch)
    print(f"ceiling ({time.time() - t0:.0f}s): "
          f"{ {k: round(v, 2) for k, v in ceiling.items()} }", flush=True)

    t0 = time.time()
    mse = sample_latent_mse(
        model, params, batch, num_steps=opt.sample_steps
    )
    print(f"sampled-latent MSE ({time.time() - t0:.0f}s): "
          f"{ {k: round(v, 4) for k, v in mse.items()} }", flush=True)

    out = {"latent_stats": stats, "vae_ceiling": ceiling,
           "sampled_latent_mse": mse, "sample_steps": opt.sample_steps}
    out_path = os.path.join(opt.outdir, "latent_diag.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Guidance-scale calibration sweep on the oracle's TRAINED weights.

The production-protocol oracle drive (scripts/overfit_oracle_drive.py
--u-cond-percent 0.2 --guidance-scale 5) showed CFG-5 sampling GUIDES the
camera modality (+2.24 dB over baseline) but degrades lidar below the
do-nothing baseline on the 4-object overfit. This sweep scores the SAME
trained weights across guidance scales to separate "the uncond vectors
garble lidar" (bad at every scale) from "scale 5 over-amplifies a
degenerate 4-object uncond branch" (monotone degradation with scale, fine
at low scale). The reference's scale-5 protocol is calibrated against a
model trained on full nuScenes (scripts/realism_test_bench.sh); an
overfit's uncond branch sees only 4 objects x 20% of steps.

Needs logs/overfit_oracle/{phase_vae.pkl,trained_params.pkl} from the
drive. Writes <outdir>/scale_sweep.json.
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
    p.add_argument("--scales", default="1,1.5,2,3")
    p.add_argument("--calibrate-latent-scale", action="store_true",
                   default=True,
                   help="recalibrate per-modality latent scales from the "
                        "phase checkpoint exactly as the drive did (the "
                        "trained weights were trained on calibrated "
                        "latents)")
    opt = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.overfit_oracle import (
        latent_stats,
        make_object_set,
        sample_and_score,
        sample_latent_mse,
    )
    from mobi_tpu.pipeline import make_inpaint_pipeline
    from mobi_tpu.utils.cache import enable_compilation_cache
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml

    enable_compilation_cache()
    cfg = load_config([opt.config], [])
    cfg["model"]["params"]["u_cond_percent"] = 0.2
    cfg["model"]["params"]["unet_config"]["params"].setdefault(
        "use_checkpoint", True
    )
    cfg["model"]["params"]["first_stage_config"]["params"].setdefault(
        "use_checkpoint", True
    )
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)
    dev = jax.devices()[0]

    batch = make_object_set(
        opt.objects, mcfg.image_height, mcfg.image_width, seed=0,
        ref_hw=(mcfg.ref_image_size, mcfg.ref_image_size),
    )

    with open(os.path.join(opt.outdir, "trained_params.pkl"), "rb") as f:
        params = pickle.load(f)["params"]
    params = jax.device_put(params, dev)
    print("trained params resident", flush=True)

    if opt.calibrate_latent_scale:
        import dataclasses as _dc

        z = latent_stats(model, params, batch)
        mcfg = _dc.replace(
            mcfg,
            scale_factor=mcfg.scale_factor / max(z["camera_z_std"], 1e-6),
            lidar_scale_factor=mcfg.lidar_scale_factor
            / max(z["lidar_z_std"], 1e-6),
        )
        model = MobiDiffusion(mcfg)
        print(f"calibrated scales: camera {mcfg.scale_factor:.4f} "
              f"lidar {mcfg.lidar_scale_factor:.4f}", flush=True)

    rows = []
    for s in [float(x) for x in opt.scales.split(",")]:
        t0 = time.time()
        pipeline = make_inpaint_pipeline(
            model, num_steps=opt.sample_steps, guidance_scale=s,
            sampler="ddim", deterministic_encode=True,
        )
        scores = sample_and_score(
            model, params, batch, num_steps=opt.sample_steps,
            pipeline=pipeline,
        )
        lat = sample_latent_mse(
            model, params, batch, num_steps=opt.sample_steps,
            guidance_scale=s, sampler="ddim",
        )
        row = {"scale": s,
               **{k: round(float(v), 3) for k, v in scores.items()},
               **{k: round(float(v), 4) for k, v in lat.items()},
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        jax.clear_caches()

    out = os.path.join(opt.outdir, "scale_sweep.json")
    with open(out, "w") as f:
        json.dump({"config": opt.config, "sample_steps": opt.sample_steps,
                   "u_cond_percent": 0.2, "rows": rows}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()

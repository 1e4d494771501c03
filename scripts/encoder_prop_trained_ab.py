#!/usr/bin/env python
"""Encoder-propagation A/B on TRAINED weights (closes the 'random-weight
only' caveat on the fast mode).

scripts/encoder_prop_accuracy.py sweeps the interval on perturbed random
init — it measures numerical sensitivity of the computation, not what the
knob does to a model that has actually learned something. This script
loads the overfit-oracle's trained mini-256 params
(logs/overfit_oracle/trained_params.pkl, written by
scripts/overfit_oracle_drive.py) and samples the SAME objects exact
(interval 1) vs encoder_interval N from the same noise, reporting

  * the oracle gate metric (masked-region PSNR vs GT) per variant — does
    the fast mode keep the LEARNED inpainting quality?
  * cross-variant PSNR (exact vs interval outputs) — the divergence the
    random-weight sweep estimates, now on trained weights.

Reference for the knob: encoder-propagation DDIM (PAPERS.md; beyond the
reference repo's exact samplers).

  /opt/venv/bin/python scripts/encoder_prop_trained_ab.py \
      [--params logs/overfit_oracle/trained_params.pkl] [--intervals 2 3]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b, peak=2.0):
    import numpy as np

    mse = float(((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2
                 ).mean())
    return 10.0 * np.log10(peak * peak / max(mse, 1e-12))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/mobi_nusc-mini_256.yaml")
    p.add_argument("--params", default="logs/overfit_oracle/trained_params.pkl")
    p.add_argument("--intervals", type=int, nargs="+", default=[2, 3])
    p.add_argument("--sample-steps", type=int, default=20)
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--out", default="logs/overfit_oracle/encoder_prop_trained_ab.json")
    opt = p.parse_args(argv)

    import jax
    import numpy as np

    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.overfit_oracle import make_object_set, masked_psnr
    from mobi_tpu.pipeline import make_inpaint_pipeline
    from mobi_tpu.utils.cache import enable_compilation_cache
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml

    enable_compilation_cache()
    cfg = load_config([opt.config], [])
    cfg["model"]["params"]["u_cond_percent"] = 0.0
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)
    with open(opt.params, "rb") as f:
        params = pickle.load(f)["params"]
    params = jax.device_put(params, jax.devices()[0])
    batch = make_object_set(
        opt.objects, mcfg.image_height, mcfg.image_width, seed=0,
        ref_hw=(mcfg.ref_image_size, mcfg.ref_image_size),
    )
    gt_c = np.asarray(batch["image"]["GT"])
    gt_l = np.asarray(batch["lidar"]["range_data"])
    region_c = 1.0 - np.asarray(batch["image"]["inpaint_mask"])
    region_l = 1.0 - np.asarray(batch["lidar"]["range_mask"])

    outs = {}
    report = {"config": opt.config, "sample_steps": opt.sample_steps,
              "variants": {}}
    for interval in [1] + list(opt.intervals):
        t0 = time.time()
        pipe = make_inpaint_pipeline(
            model, num_steps=opt.sample_steps, guidance_scale=1.0,
            sampler="ddim", deterministic_encode=True,
            encoder_interval=interval,
        )
        out = pipe(params, batch, jax.random.PRNGKey(7))
        out = {k: np.asarray(v) for k, v in out.items()}
        outs[interval] = out
        row = {
            "camera_psnr_vs_gt": round(
                masked_psnr(out["camera"], gt_c, region_c), 2),
            "lidar_psnr_vs_gt": round(
                masked_psnr(out["lidar"], gt_l, region_l), 2),
            "wall_s": round(time.time() - t0, 1),
        }
        if interval != 1:
            row["camera_psnr_vs_exact"] = round(
                psnr(out["camera"], outs[1]["camera"]), 2)
            row["lidar_psnr_vs_exact"] = round(
                psnr(out["lidar"], outs[1]["lidar"]), 2)
        report["variants"][f"interval_{interval}"] = row
        print(f"interval {interval}: {row}", flush=True)

    os.makedirs(os.path.dirname(opt.out), exist_ok=True)
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Overfit learning oracle on the real chip at the mini-256 config.

The v5e-scale run of mobi_tpu.overfit_oracle (the CPU-sized gate lives in
tests/test_overfit_oracle.py): fabricate a FIXED set of synthetic objects
at 256x256, overfit the production VAEs on their frames, overfit the full
UNet (MOBI_TRAIN_UNET_FULL) on the same set, then sample inpaints for the
SAME objects through the production pipeline and gate on masked-region
PSNR vs GT beating the do-nothing baseline and an absolute bar. This is
the train->sample learning proof the reference gets from its realism bench
against published checkpoints (/root/reference/README.md:155-160), which
cannot run here without the artifacts.

Writes metrics JSON + before/after PNG grids (GT | masked input | sampled
inpaint) under --outdir; exits non-zero if the gate fails.

  /opt/venv/bin/python scripts/overfit_oracle_drive.py \
      [--config configs/mobi_nusc-mini_256.yaml] [--objects 4]
      [--vae-steps 400] [--diff-steps 1500] [--outdir logs/overfit_oracle]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_grid(path: str, rows) -> None:
    """rows: list of [-1,1] HxWx3 images -> one stacked PNG."""
    import cv2
    import numpy as np

    u8 = [
        np.clip((np.asarray(r, np.float32) + 1.0) * 127.5, 0, 255).astype(
            np.uint8
        )
        for r in rows
    ]
    grid = np.concatenate(u8, axis=0)
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/mobi_nusc-mini_256.yaml")
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--vae-steps", type=int, default=1200,
                   help="the camera-VAE round-trip is the oracle's PSNR "
                        "ceiling (400 steps left it at 11.79 dB masked — "
                        "the sampler hit 11.73); converge it")
    p.add_argument("--vae-minibatch", type=int, default=4,
                   help="frames per VAE train step (full-frame backward at "
                        "256 OOMs a 16 GB chip; 4 fits with remat + "
                        "donation)")
    p.add_argument("--diff-steps", type=int, default=4000)
    p.add_argument("--diff-lr", type=float, default=3e-4,
                   help="the CPU-calibrated AdamW overfit lr "
                        "(tests/test_overfit_oracle.py)")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adafactor"],
                   help="adamw (default) runs with a bf16 first-moment "
                        "slot so full-UNet mini-256 fits 15.75 GB HBM "
                        "(fp32 slots: 16.33 GB, OOM). adafactor fits too "
                        "but failed to leave the zero-output basin at "
                        "this scale (3 seeded runs, PROFILE.md)")
    p.add_argument("--sample-steps", type=int, default=20)
    p.add_argument("--u-cond-percent", type=float, default=0.0,
                   help="CFG dropout probability during the diffusion "
                        "overfit (reference trains with 0.2, "
                        "ddpm.py:1052-1056; 0 = pure overfit)")
    p.add_argument("--guidance-scale", type=float, default=1.0,
                   help="CFG scale at sampling (the reference's production "
                        "protocol is 5, scripts/realism_test_bench.sh)")
    p.add_argument("--sampler", default="ddim", choices=["ddim", "plms"])
    p.add_argument("--sample-segments", type=int, default=1,
                   help=">1 samples through pipeline.SegmentedInpaint "
                        "(the execute-time-limit path)")
    p.add_argument("--calibrate-latent-scale", action="store_true",
                   help="EXPERIMENT FLAG, measured NEGATIVE on the v5e: "
                        "after the VAE phase, rescale scale_factor / "
                        "lidar_scale_factor so the scaled GT latents are "
                        "unit-std per modality. Equalizes the training "
                        "eps signal exactly as intended but DEGRADES "
                        "lidar sampling below the do-nothing baseline at "
                        "every guidance scale (the lidar-vs-ceiling gap "
                        "is sampling-trajectory drift, not training-"
                        "signal imbalance — PROFILE.md 'Lidar-vs-ceiling "
                        "gap', docs/evidence/overfit_oracle_r5_calibrated/)")
    p.add_argument("--also-plms-segments", type=int, default=0,
                   help=">0: after the main scoring, score the SAME "
                        "trained weights a second time through segmented "
                        "PLMS with this many segments (the reference's "
                        "default sampler through the execute-limit path)")
    p.add_argument("--outdir", default="logs/overfit_oracle")
    p.add_argument("--camera-gate-db", type=float, default=2.0,
                   help="required camera PSNR margin over the do-nothing "
                        "baseline")
    p.add_argument("--lidar-gate-db", type=float, default=1.0)
    p.add_argument("--fresh", action="store_true",
                   help="ignore an existing post-VAE phase checkpoint")
    p.add_argument("overrides", nargs="*")
    opt = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.overfit_oracle import (
        live_hbm_gb,
        make_object_set,
        overfit_diffusion,
        overfit_vaes,
        sample_and_score,
        vae_ceiling,
    )
    from mobi_tpu.utils.cache import enable_compilation_cache
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml
    from mobi_tpu.utils.param_cache import cached_init

    enable_compilation_cache()
    cfg = load_config([opt.config], [s for s in opt.overrides if "=" in s])
    # 0.0 = pure overfit; 0.2 = the reference's production CFG-dropout
    # protocol (ddpm.py:1052-1056), whose uncond vectors the
    # --guidance-scale 5 sampling then exercises
    cfg["model"]["params"]["u_cond_percent"] = opt.u_cond_percent
    # full-UNet gradients need rematerialization headroom on a 16 GB chip
    # (PROFILE.md: remat mandatory for full-graph training at 512), and so
    # do the VAE overfit backwards at 256^2: the lidar adapter's four extra
    # full-res ResnetBlocks push the un-remat'd backward past the camera
    # step's already-near-limit peak (first lidar step ResourceExhausted
    # with only 5.9 GB live, measured)
    cfg["model"]["params"]["unet_config"]["params"].setdefault(
        "use_checkpoint", True
    )
    # (first_stage use_checkpoint governs BOTH VAEs via
    # MobiConfig.vae_use_checkpoint)
    cfg["model"]["params"]["first_stage_config"]["params"].setdefault(
        "use_checkpoint", True
    )
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)
    dev = jax.devices()[0]
    print(f"device: {dev}, config: {opt.config} "
          f"({mcfg.image_height}x{mcfg.image_width})", flush=True)

    batch = make_object_set(
        opt.objects, mcfg.image_height, mcfg.image_width, seed=0,
        ref_hw=(mcfg.ref_image_size, mcfg.ref_image_size),
    )
    os.makedirs(opt.outdir, exist_ok=True)

    # Phase checkpoint: init + untrained-score + VAE overfit take ~25 min
    # on this host; a crash in the (long-compile) diffusion phase should
    # not repeat them on rerun.
    import pickle

    phase_ckpt = os.path.join(opt.outdir, "phase_vae.pkl")
    # Everything the VAE phase's outputs depend on: a checkpoint written
    # under a different run configuration is ignored (with a warning), not
    # silently reused — --fresh forces a rebuild regardless.
    fingerprint = {
        "config": opt.config, "objects": opt.objects,
        "vae_steps": opt.vae_steps, "vae_minibatch": opt.vae_minibatch,
        "sample_steps": opt.sample_steps,
    }
    saved = None
    if os.path.exists(phase_ckpt) and not opt.fresh:
        t0 = time.time()
        with open(phase_ckpt, "rb") as f:
            saved = pickle.load(f)
        if "fingerprint" not in saved:
            print(f"WARNING: {phase_ckpt} predates fingerprinting — "
                  "reusing it on trust; pass --fresh if its run "
                  "configuration differed", flush=True)
        elif saved["fingerprint"] != fingerprint:
            print(f"WARNING: {phase_ckpt} was written by a different run "
                  f"configuration ({saved.get('fingerprint')} != "
                  f"{fingerprint}) — rebuilding the VAE phase", flush=True)
            saved = None
    if saved is not None:
        params = jax.device_put(saved["params"], dev)
        untrained, vae_final = saved["untrained"], saved["vae_final"]
        print(f"resumed post-VAE phase from {phase_ckpt} "
              f"({time.time() - t0:.0f}s); untrained={untrained} "
              f"vae_final={vae_final}", flush=True)
    else:
        t0 = time.time()
        params = cached_init(
            lambda r: model.init_params(r), jax.random.PRNGKey(0), repr(mcfg),
            shape_fn=lambda r: model.init_params(r, on_cpu=False),
        )
        params = jax.device_put(params, dev)
        print(f"params ready in {time.time() - t0:.0f}s", flush=True)

        t0 = time.time()
        untrained = sample_and_score(
            model, params, batch, num_steps=opt.sample_steps
        )
        print(f"untrained: { {k: round(v, 2) for k, v in untrained.items()} } "
              f"({time.time() - t0:.0f}s); live device GB {live_hbm_gb():.2f}",
              flush=True)
        jax.clear_caches()  # the untrained pipeline's executables are done

        t0 = time.time()
        params, vae_final = overfit_vaes(
            model, params, batch, steps=opt.vae_steps, log_every=100,
            minibatch=opt.vae_minibatch,
        )
        print(f"vae overfit: {vae_final} ({time.time() - t0:.0f}s)",
              flush=True)
        with open(phase_ckpt, "wb") as f:
            pickle.dump(
                {"params": jax.device_get(params), "untrained": untrained,
                 "vae_final": vae_final, "fingerprint": fingerprint}, f,
            )
        print(f"phase checkpoint written: {phase_ckpt}", flush=True)

    ceiling = vae_ceiling(model, params, batch)
    print(f"VAE round-trip ceiling (masked PSNR): "
          f"{ {k: round(v, 2) for k, v in ceiling.items()} }", flush=True)
    from mobi_tpu.overfit_oracle import latent_stats, sample_latent_mse

    z_stats = latent_stats(model, params, batch)
    print(f"scaled GT latent stats: "
          f"{ {k: round(v, 3) for k, v in z_stats.items()} }", flush=True)

    if opt.calibrate_latent_scale:
        import dataclasses as _dc

        mcfg = _dc.replace(
            mcfg,
            scale_factor=mcfg.scale_factor
            / max(z_stats["camera_z_std"], 1e-6),
            lidar_scale_factor=mcfg.lidar_scale_factor
            / max(z_stats["lidar_z_std"], 1e-6),
        )
        model = MobiDiffusion(mcfg)  # params are scale-independent
        z_stats_cal = latent_stats(model, params, batch)
        print(f"calibrated scales: camera {mcfg.scale_factor:.4f}, lidar "
              f"{mcfg.lidar_scale_factor:.4f}; post-calibration stats: "
              f"{ {k: round(v, 3) for k, v in z_stats_cal.items()} }",
              flush=True)

    t0 = time.time()
    params, diff_final = overfit_diffusion(
        model, params, batch, steps=opt.diff_steps, lr=opt.diff_lr,
        log_every=200, optimizer=opt.optimizer, cosine_decay=True,
        randomize_zero_init=True,
        adam_mu_dtype=jnp.bfloat16 if opt.optimizer == "adamw" else None,
    )
    print(f"diffusion overfit: {diff_final} ({time.time() - t0:.0f}s); "
          f"live device GB {live_hbm_gb():.2f}", flush=True)
    with open(os.path.join(opt.outdir, "trained_params.pkl"), "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "diff_final": diff_final}, f)
    print("trained params written (TRAINED-weight follow-ups: encoder-prop "
          "A/B, .ckpt export round-trip)", flush=True)
    jax.clear_caches()  # free the train-step executable before sampling

    t0 = time.time()
    from mobi_tpu.pipeline import make_inpaint_pipeline

    pipeline = make_inpaint_pipeline(
        model, num_steps=opt.sample_steps, guidance_scale=opt.guidance_scale,
        sampler=opt.sampler, deterministic_encode=True,
        sample_segments=opt.sample_segments,
    )
    trained = sample_and_score(
        model, params, batch, num_steps=opt.sample_steps, pipeline=pipeline
    )
    print(f"trained ({opt.sampler}, scale {opt.guidance_scale}, "
          f"segments {opt.sample_segments}): "
          f"{ {k: round(v, 2) for k, v in trained.items()} } "
          f"({time.time() - t0:.0f}s)", flush=True)

    # decoder-independent latent-space diagnosis of any modality gap
    lat_mse = sample_latent_mse(
        model, params, batch, num_steps=opt.sample_steps,
        guidance_scale=opt.guidance_scale, sampler=opt.sampler,
    )
    print(f"sampled-latent MSE vs GT latents: "
          f"{ {k: round(v, 4) for k, v in lat_mse.items()} }", flush=True)

    trained_plms_seg = None
    if opt.also_plms_segments:
        t0 = time.time()
        trained_plms_seg = sample_and_score(
            model, params, batch, num_steps=opt.sample_steps,
            guidance_scale=opt.guidance_scale, sampler="plms",
            sample_segments=opt.also_plms_segments,
        )
        print(f"trained (plms, scale {opt.guidance_scale}, segments "
              f"{opt.also_plms_segments}): "
              f"{ {k: round(v, 2) for k, v in trained_plms_seg.items()} } "
              f"({time.time() - t0:.0f}s)", flush=True)

    # evidence grids: GT | masked input | sampled inpaint, one file/object
    out = pipeline(params, batch, jax.random.PRNGKey(7))
    cam = np.asarray(out["camera"])
    for i in range(opt.objects):
        save_grid(
            os.path.join(opt.outdir, f"object_{i}.png"),
            [
                batch["image"]["GT"][i],
                batch["image"]["inpaint_image"][i],
                cam[i],
            ],
        )

    report = {
        "config": opt.config,
        "objects": opt.objects,
        "vae_steps": opt.vae_steps,
        "diff_steps": opt.diff_steps,
        "u_cond_percent": opt.u_cond_percent,
        "guidance_scale": opt.guidance_scale,
        "sampler": opt.sampler,
        "sample_segments": opt.sample_segments,
        "latent_stats": z_stats,
        "calibrated_scales": (
            {"scale_factor": mcfg.scale_factor,
             "lidar_scale_factor": mcfg.lidar_scale_factor}
            if opt.calibrate_latent_scale else None
        ),
        "sampled_latent_mse": lat_mse,
        "trained_plms_segmented": trained_plms_seg,
        "vae_final_l1": vae_final,
        "vae_ceiling_masked_psnr": ceiling,
        "diffusion_final_loss": diff_final["final_loss"],
        "untrained": untrained,
        "trained": trained,
        "gate_headroom_db": {
            "camera_vs_ceiling": round(
                ceiling["camera_ceiling_psnr"] - trained["camera_psnr"], 2
            ),
            "lidar_vs_ceiling": round(
                ceiling["lidar_ceiling_psnr"] - trained["lidar_psnr"], 2
            ),
        },
        "gate": {
            "camera_margin_db": round(
                trained["camera_psnr"] - trained["camera_psnr_baseline"], 2
            ),
            "lidar_margin_db": round(
                trained["lidar_psnr"] - trained["lidar_psnr_baseline"], 2
            ),
        },
    }
    passed = (
        trained["camera_psnr"]
        > trained["camera_psnr_baseline"] + opt.camera_gate_db
        and trained["lidar_psnr"]
        > trained["lidar_psnr_baseline"] + opt.lidar_gate_db
        and trained["camera_psnr"] > untrained["camera_psnr"] + 3.0
    )
    report["gate"]["passed"] = bool(passed)
    with open(os.path.join(opt.outdir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["gate"]), flush=True)
    if not passed:
        print("OVERFIT ORACLE GATE FAILED", flush=True)
        sys.exit(1)
    print("OVERFIT ORACLE GATE PASSED", flush=True)


if __name__ == "__main__":
    main()

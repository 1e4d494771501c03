#!/usr/bin/env python
"""Export a mobi_tpu checkpoint to the reference's Lightning .ckpt layout.

The inverse of the torch import path: an orbax training checkpoint written
by train.py becomes a `.ckpt` the reference consumes directly via
`load_model_from_config` / `--pretrained_model`
(/root/reference/scripts/inference_test_bench.py:150-167, main.py:524-533,
ldm/models/diffusion/ddpm.py:196-212). The EMA shadow (if the state carries
one) is written as the LitEma `model_ema.*` buffers and the DDPM schedule
buffers are emitted from the model's schedule, so the exported state dict
is key-complete.

Usage:
  /opt/venv/bin/python scripts/export_checkpoint.py \
      --config configs/mobi_nusc_512.yaml \
      --ckpt logs/<run>/checkpoints [--step N] \
      --out exported_mobi.ckpt [overrides...]

--ckpt also accepts a torch .ckpt (import -> export round-trip sanity).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True,
                   help="orbax manager dir / step dir, or a torch .ckpt")
    p.add_argument("--step", type=int, default=None,
                   help="orbax step to export (default: latest)")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--no-schedule", action="store_true",
                   help="omit the DDPM schedule buffers")
    p.add_argument("overrides", nargs="*")
    opt = p.parse_args(argv)

    from mobi_tpu.export_torch import (
        export_from_config,
        save_reference_checkpoint,
    )
    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml

    cfg = load_config([opt.config], [s for s in opt.overrides if "=" in s])
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)

    ema_unet, ema_updates, step, epoch = None, None, 0, 0
    if os.path.isdir(opt.ckpt):
        from mobi_tpu.checkpoint import CheckpointManager

        ckpt_dir, step_arg = opt.ckpt, opt.step
        base = os.path.basename(os.path.normpath(ckpt_dir))
        if base.isdigit():
            ckpt_dir = os.path.dirname(os.path.normpath(ckpt_dir))
            step_arg = int(base)
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(step=step_arg)
        params = restored["params"]
        step = step_arg if step_arg is not None else (mgr.latest_step() or 0)
        ema = restored.get("ema")
        if ema is not None:
            ema_unet = ema["ema_params"]
            ema_updates = int(ema.get("num_updates", 0))
        print(f"restored orbax state (step {step}"
              f"{', with EMA' if ema_unet is not None else ''})")
    else:
        # torch .ckpt input: import then re-export (round-trip/debug path)
        from mobi_tpu.checkpoint import load_torch_checkpoint
        from mobi_tpu.import_torch import import_mobi_checkpoint

        sd = load_torch_checkpoint(opt.ckpt)
        params = import_mobi_checkpoint(
            sd,
            channel_mult=tuple(mcfg.unet_channel_mult),
            num_res_blocks=mcfg.unet_num_res_blocks,
            attention_resolutions=tuple(mcfg.unet_attention_resolutions),
            vae_resolution=mcfg.image_height,
            vae_ch_mult=tuple(mcfg.vae_ch_mult),
            vae_num_res_blocks=mcfg.vae_num_res_blocks,
        )
        print(f"imported torch checkpoint {opt.ckpt}")

    out_sd = export_from_config(
        mcfg, params,
        ema_unet=ema_unet, ema_num_updates=ema_updates,
        schedule=None if opt.no_schedule else model.schedule,
    )
    save_reference_checkpoint(opt.out, out_sd, global_step=step, epoch=epoch)
    print(f"wrote {opt.out}: {len(out_sd)} state-dict entries "
          f"({sum(v.size for v in out_sd.values()) * 4 / 1e6:.1f} MB fp32)")


if __name__ == "__main__":
    main()

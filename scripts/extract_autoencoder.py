#!/usr/bin/env python
"""Extract the camera VAE subtree from a full-model checkpoint.

Reference counterpart: /root/reference/scripts/extract_autoencoder.py (loads
a full MObI/PbE checkpoint and saves `first_stage_model.state_dict()` as a
standalone VAE checkpoint). Here: reads either an orbax checkpoint dir (as
written by train.py's CheckpointManager) or a torch .ckpt (through the
importer), pulls the `vae` (camera first-stage) subtree, and pickles it.

Usage:
  python scripts/extract_autoencoder.py --ckpt runs/mobi/ckpts \
      --out checkpoints/image_vae.pkl [--subtree vae]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir, params pickle, or torch .ckpt")
    p.add_argument("--out", required=True)
    p.add_argument("--subtree", default="vae",
                   help="param subtree to extract (vae | lidar_vae | unet)")
    args = p.parse_args()

    if os.path.isdir(args.ckpt):
        from mobi_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt)
        state = mgr.restore()
        params = state["params"] if isinstance(state, dict) and "params" in state else state.params
    elif args.ckpt.endswith((".ckpt", ".pth", ".pt")):
        from mobi_tpu.checkpoint import load_torch_checkpoint
        from mobi_tpu.import_torch import import_mobi_checkpoint

        params = import_mobi_checkpoint(load_torch_checkpoint(args.ckpt))
    else:
        with open(args.ckpt, "rb") as f:
            params = pickle.load(f)
        if isinstance(params, dict) and "params" in params:
            params = params["params"]

    sub = params
    for key in args.subtree.split("/"):
        sub = sub[key]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({args.subtree: sub}, f)
    n = sum(x.size for x in _leaves(sub))
    print(f"wrote {args.out}: subtree '{args.subtree}', {n/1e6:.1f}M params")


def _leaves(tree):
    import jax

    return [x for x in jax.tree.leaves(tree)]


if __name__ == "__main__":
    main()

"""Mean LPIPS between paired image folders (reference
eval_tool/camera/lpips_score.py): files are paired by sorted order; images
resized to 256 and compared with AlexNet LPIPS.

  python eval_tool/camera/lpips_score.py --path_target DIR --path_pred DIR \
      --lpips_weights lpips_alex.pth --alexnet_weights alexnet.pth
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from eval_tool.camera.fid_score import list_images  # noqa: E402


def load_batch(paths, size=256):
    import cv2
    from PIL import Image

    out = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        out.append(img.astype(np.float32) / 127.5 - 1.0)
    return np.stack(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path_target", required=True)
    p.add_argument("--path_pred", required=True)
    p.add_argument("--lpips_weights", default=os.environ.get("LPIPS_WEIGHTS"))
    p.add_argument("--alexnet_weights", default=os.environ.get("ALEXNET_WEIGHTS"))
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    if not args.lpips_weights or not args.alexnet_weights:
        sys.exit(
            "LPIPS requires weights: --lpips_weights (lpips pkg 'alex' state "
            "dict) and --alexnet_weights (torchvision alexnet state dict)."
        )

    import jax
    import jax.numpy as jnp

    from mobi_tpu.checkpoint import load_torch_checkpoint
    from mobi_tpu.eval.lpips import LPIPS, import_lpips_weights

    params = import_lpips_weights(
        load_torch_checkpoint(args.lpips_weights),
        load_torch_checkpoint(args.alexnet_weights),
    )
    net = LPIPS()
    params = jax.device_put(params)  # jit arg, not a baked-in HLO constant
    apply = jax.jit(lambda p, x, y: net.apply(p, x, y))

    tfiles = list_images(args.path_target)
    pfiles = list_images(args.path_pred)
    assert len(tfiles) == len(pfiles), "folder sizes differ"
    dists = []
    for i in range(0, len(tfiles), args.batch_size):
        a = jnp.asarray(load_batch(tfiles[i : i + args.batch_size]))
        b = jnp.asarray(load_batch(pfiles[i : i + args.batch_size]))
        dists.append(np.asarray(apply(params, a, b)))
    print(f"LPIPS: {float(np.concatenate(dists).mean()):.4f}")


if __name__ == "__main__":
    main()

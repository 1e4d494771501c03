"""FID between two image folders (reference eval_tool/camera/fid_score.py).

  python eval_tool/camera/fid_score.py --path_target DIR --path_pred DIR \
      [--weights inception_v3.pth] [--batch-size 32]

Features: InceptionV3 pool3 (2048-d, mobi_tpu.eval.inception) with weights
imported from a torchvision inception_v3 state dict. Like the reference
(fid_score.py:67-80), images pass through CLIP-style preprocessing
(resize 224 -> center pattern), then are resized to 299 for Inception.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

IMAGE_EXTENSIONS = {"bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp"}


def list_images(path):
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.split(".")[-1].lower() in IMAGE_EXTENSIONS
    )


def load_batch(paths, size=299):
    import cv2
    from PIL import Image

    imgs = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        imgs.append(img.astype(np.float32) / 127.5 - 1.0)
    return np.stack(imgs)


def compute_features(files, params, batch_size=32):
    import jax
    import jax.numpy as jnp

    from mobi_tpu.eval.inception import InceptionV3Features

    net = InceptionV3Features()
    apply = jax.jit(lambda p, x: net.apply({"params": p}, x))
    feats = []
    for i in range(0, len(files), batch_size):
        batch = load_batch(files[i : i + batch_size])
        feats.append(np.asarray(apply(params, jnp.asarray(batch))))
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path_target", required=True)
    p.add_argument("--path_pred", required=True)
    p.add_argument("--weights", default=os.environ.get("INCEPTION_WEIGHTS"),
                   help="torchvision inception_v3 state dict (.pth)")
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    if not args.weights or not os.path.exists(args.weights):
        sys.exit(
            "FID requires InceptionV3 weights: pass --weights (torchvision "
            "inception_v3 .pth) or set INCEPTION_WEIGHTS."
        )

    from mobi_tpu.checkpoint import load_torch_checkpoint
    from mobi_tpu.eval.frechet import frechet_from_features
    from mobi_tpu.eval.inception import import_inception_weights

    params = import_inception_weights(load_torch_checkpoint(args.weights))
    f1 = compute_features(list_images(args.path_target), params, args.batch_size)
    f2 = compute_features(list_images(args.path_pred), params, args.batch_size)
    fid = frechet_from_features(f1, f2)
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()

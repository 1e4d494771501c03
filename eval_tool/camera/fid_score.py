"""Camera "FID" between two image folders — faithful to the reference
(eval_tool/camera/fid_score.py + its vendored inception.py).

  python eval_tool/camera/fid_score.py --path_target DIR --path_pred DIR \
      [--weights clip_vit_b32.pth] [--batch-size 64]

IMPORTANT parity note: despite the name, the reference's camera FID does NOT
run InceptionV3. Its vendored `inception.py` rewires `InceptionV3.forward`
to `self.clip_model.encode_image(x)` (inception.py:143-145; the Inception
blocks and the 299-resize/normalize steps are commented out at 147-162), and
every image is loaded through the OpenAI `clip.load("ViT-B/32")` preprocess
(fid_score.py:67-80). The published numbers are therefore a CLIP-FID over
unnormalized 512-d ViT-B/32 `encode_image` features. This script reproduces
exactly that: CLIP preprocess -> CLIP ViT-B/32 image tower -> visual
projection (no L2 norm) -> Frechet distance over (mu, sigma).

`--backbone inception` additionally offers a classical pytorch-fid
InceptionV3 pool3 FID (the behavior the reference's dead code *intended*),
for users who want numbers comparable to the wider literature.
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


def load_batch_clip(paths):
    """OpenAI CLIP preprocessing (reference fid_score.py:67-80)."""
    from PIL import Image

    from mobi_tpu.eval.clip_embed import clip_preprocess_image

    return np.stack([clip_preprocess_image(Image.open(p)) for p in paths])


def load_batch_inception(paths, size=299):
    import cv2
    from PIL import Image

    imgs = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        imgs.append(img.astype(np.float32) / 127.5 - 1.0)
    return np.stack(imgs)


def compute_clip_features(files, params, proj, batch_size=64):
    """Unnormalized `encode_image` features [N, 512] — the reference's
    inception.py:143 output (no L2 normalization before the Gaussian fit)."""
    import jax
    import jax.numpy as jnp

    from mobi_tpu.eval.clip_embed import ClipImageEmbedder

    net = ClipImageEmbedder()
    apply = jax.jit(
        lambda p, x: net.apply({"params": p}, x) @ jnp.asarray(proj)
    )
    feats = []
    for i in range(0, len(files), batch_size):
        batch = load_batch_clip(files[i : i + batch_size])
        feats.append(np.asarray(apply(params, jnp.asarray(batch))))
    return np.concatenate(feats)


def compute_inception_features(files, params, batch_size=32):
    import jax
    import jax.numpy as jnp

    from mobi_tpu.eval.inception import InceptionV3Features

    net = InceptionV3Features()
    apply = jax.jit(lambda p, x: net.apply({"params": p}, x))
    feats = []
    for i in range(0, len(files), batch_size):
        batch = load_batch_inception(files[i : i + batch_size])
        feats.append(np.asarray(apply(params, jnp.asarray(batch))))
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path_target", required=True)
    p.add_argument("--path_pred", required=True)
    p.add_argument("--backbone", choices=("clip", "inception"), default="clip",
                   help="'clip' reproduces the reference exactly (its "
                        "'InceptionV3' is rewired to CLIP encode_image); "
                        "'inception' is a classical pool3 FID")
    p.add_argument("--weights", default=None,
                   help="clip: HF CLIP ViT-B/32 state dict (.pth; or set "
                        "CLIP_B32_WEIGHTS); inception: torchvision "
                        "inception_v3 state dict (or INCEPTION_WEIGHTS)")
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args()

    from mobi_tpu.checkpoint import load_torch_checkpoint
    from mobi_tpu.eval.frechet import frechet_from_features

    if args.backbone == "clip":
        weights = args.weights or os.environ.get("CLIP_B32_WEIGHTS")
        if not weights or not os.path.exists(weights):
            sys.exit(
                "camera FID requires CLIP ViT-B/32 weights: pass --weights "
                "(HF CLIPModel state dict) or set CLIP_B32_WEIGHTS."
            )
        from mobi_tpu.eval.clip_embed import import_clip_b32

        params, proj = import_clip_b32(load_torch_checkpoint(weights))
        f1 = compute_clip_features(
            list_images(args.path_target), params, proj, args.batch_size
        )
        f2 = compute_clip_features(
            list_images(args.path_pred), params, proj, args.batch_size
        )
    else:
        weights = args.weights or os.environ.get("INCEPTION_WEIGHTS")
        if not weights or not os.path.exists(weights):
            sys.exit(
                "inception FID requires --weights (torchvision inception_v3 "
                ".pth) or INCEPTION_WEIGHTS."
            )
        from mobi_tpu.eval.inception import import_inception_weights

        params = import_inception_weights(load_torch_checkpoint(weights))
        f1 = compute_inception_features(
            list_images(args.path_target), params, args.batch_size
        )
        f2 = compute_inception_features(
            list_images(args.path_pred), params, args.batch_size
        )
    fid = frechet_from_features(f1, f2)
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()

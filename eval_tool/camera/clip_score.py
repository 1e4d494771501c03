"""CLIP similarity score between reference and predicted object crops
(reference eval_tool/camera/clip_score.py): cosine similarity x100 between
CLIP image embeddings of paired 224x224 crops.

  python eval_tool/camera/clip_score.py --path_ref DIR --path_pred DIR \
      --weights clip_vit_b32.pth

The reference uses ViT-B/32; pass its vision-tower state dict (keys
`visual_projection.weight` + `vision_model.*` as in HF CLIPModel).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from eval_tool.camera.fid_score import list_images  # noqa: E402


def load_batch(paths):
    """OpenAI `clip.load` preprocess — shorter-side resize + center crop
    (reference clip_score.py:52-54), NOT a square resize."""
    from PIL import Image

    from mobi_tpu.eval.clip_embed import clip_preprocess_image

    return np.stack([clip_preprocess_image(Image.open(p)) for p in paths])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path_ref", required=True)
    p.add_argument("--path_pred", required=True)
    p.add_argument("--weights", default=os.environ.get("CLIP_B32_WEIGHTS"))
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()
    if not args.weights:
        sys.exit("CLIP score requires --weights (HF CLIP ViT-B/32 state dict).")

    import jax
    import jax.numpy as jnp

    from mobi_tpu.checkpoint import load_torch_checkpoint
    from mobi_tpu.eval.clip_embed import ClipImageEmbedder, import_clip_b32

    sd = load_torch_checkpoint(args.weights)
    params, proj = import_clip_b32(sd)
    # device-put ONCE and pass as jit arguments — closing over the numpy
    # tree would bake ~350 MB of weight constants into the HLO (and blow
    # the remote compile service's request-size limit on the TPU runtime)
    params = jax.device_put(params)
    proj = jax.device_put(proj)
    net = ClipImageEmbedder()

    @jax.jit
    def embed(params, proj, x):
        pooled = net.apply({"params": params}, x)
        feats = pooled @ proj
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    rfiles = list_images(args.path_ref)
    pfiles = list_images(args.path_pred)
    assert len(rfiles) == len(pfiles)
    sims = []
    for i in range(0, len(rfiles), args.batch_size):
        a = embed(params, proj,
                  jnp.asarray(load_batch(rfiles[i : i + args.batch_size])))
        b = embed(params, proj,
                  jnp.asarray(load_batch(pfiles[i : i + args.batch_size])))
        sims.append(np.asarray((a * b).sum(-1)))
    print(f"CLIP score: {float(np.concatenate(sims).mean()) * 100:.2f}")


if __name__ == "__main__":
    main()

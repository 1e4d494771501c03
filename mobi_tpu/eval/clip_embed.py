"""CLIP image embedder for the CLIP realism score (ViT-B/32).

Reuses the CLIPVisionTower backbone with B/32 dimensions; the score needs the
post-pooler `visual_projection` (1024->512 for L/14, 768->512 for B/32) to
land in CLIP's joint space.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import numpy as np

from mobi_tpu.models.clip import CLIPVisionTower


class ClipImageEmbedder(CLIPVisionTower):
    """ViT-B/32 defaults."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12


def clip_preprocess_image(img) -> np.ndarray:
    """The exact OpenAI `clip.load` preprocessing pipeline (the reference
    feeds it to BOTH its CLIP score and its camera "FID":
    eval_tool/camera/inception.py:67 and clip_score.py:52):

      Resize(224, BICUBIC)  — shorter side to 224, aspect preserved
      CenterCrop(224)
      convert to RGB, scale to [0, 1]
      Normalize(CLIP mean/std)

    torchvision executes Resize/CenterCrop on the PIL image, so running the
    same arithmetic directly through PIL is bit-identical. `img` is a PIL
    image; returns [224, 224, 3] float32, channels last."""
    from PIL import Image

    from mobi_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    size = 224
    w, h = img.size
    # torchvision F.resize(int) semantics: shorter side -> size
    if w <= h:
        new_w, new_h = size, max(int(size * h / w), size)
    else:
        new_w, new_h = max(int(size * w / h), size), size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    # torchvision F.center_crop rounding
    top = int(round((new_h - size) / 2.0))
    left = int(round((new_w - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    arr = (arr - np.asarray(CLIP_IMAGE_MEAN, np.float32)) / np.asarray(
        CLIP_IMAGE_STD, np.float32
    )
    return arr.astype(np.float32)


def import_clip_b32(
    sd: Dict[str, np.ndarray], num_layers: int = 12
) -> Tuple[Dict, np.ndarray]:
    """HF CLIPModel state dict -> (tower params, visual_projection [768,512])."""
    from mobi_tpu.import_torch import _strip_prefix, import_cond_stage

    # reuse the vision-tower importer by aliasing the prefix it expects
    renamed = {}
    for k, v in sd.items():
        if k.startswith("vision_model."):
            renamed[f"transformer.vision_model.{k[len('vision_model.'):]}"] = v
    params = import_cond_stage(renamed, num_clip_layers=num_layers)["transformer"]
    proj = np.asarray(sd["visual_projection.weight"]).T  # [hidden, 512]
    return params, proj

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


def import_clip_b32(sd: Dict[str, np.ndarray]) -> Tuple[Dict, np.ndarray]:
    """HF CLIPModel state dict -> (tower params, visual_projection [768,512])."""
    from mobi_tpu.import_torch import _strip_prefix, import_cond_stage

    # reuse the vision-tower importer by aliasing the prefix it expects
    renamed = {}
    for k, v in sd.items():
        if k.startswith("vision_model."):
            renamed[f"transformer.vision_model.{k[len('vision_model.'):]}"] = v
    params = import_cond_stage(renamed, num_clip_layers=12)["transformer"]
    proj = np.asarray(sd["visual_projection.weight"]).T  # [768, 512]
    return params, proj

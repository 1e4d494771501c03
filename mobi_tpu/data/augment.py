"""Reference-crop augmentations (cv2/numpy).

Replaces the reference's albumentations pipeline
(/root/reference/ldm/data/nuscenes.py:239-250): Resize(224) +
HorizontalFlip(p=.5) + Rotate(+-30, zero border) + Blur(p=.5) +
RandomBrightnessContrast(+-0.3, p=.5). Same transform family and parameter
ranges; exact RNG streams differ (the reference's augs are themselves
stochastic).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    import cv2

    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def ref_augment(
    img: np.ndarray,
    rng: Optional[np.random.Generator] = None,
    size: int = 224,
    enabled: bool = True,
) -> np.ndarray:
    """uint8 HWC crop -> augmented uint8 [size, size, 3]."""
    import cv2

    img = resize_image(img, size, size)
    if not enabled or rng is None:
        return img

    if rng.uniform() < 0.5:
        img = img[:, ::-1].copy()

    angle = rng.uniform(-30, 30)
    mat = cv2.getRotationMatrix2D((size / 2, size / 2), angle, 1.0)
    img = cv2.warpAffine(
        img, mat, (size, size), borderMode=cv2.BORDER_CONSTANT, borderValue=0
    )

    if rng.uniform() < 0.5:
        k = int(rng.integers(3, 8)) | 1
        img = cv2.blur(img, (k, k))

    if rng.uniform() < 0.5:
        alpha = 1.0 + rng.uniform(-0.3, 0.3)   # contrast
        beta = rng.uniform(-0.3, 0.3) * 255    # brightness
        img = np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)

    return img


def to_model_range(img_uint8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1, 1] (reference get_tensor normalize)."""
    return (img_uint8.astype(np.float32) / 255.0 - 0.5) * 2.0


def to_clip_input(img_uint8: np.ndarray) -> np.ndarray:
    """uint8 -> CLIP-normalized float32 HWC (reference get_tensor_clip)."""
    from mobi_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    x = img_uint8.astype(np.float32) / 255.0
    return (x - np.asarray(CLIP_IMAGE_MEAN, np.float32)) / np.asarray(
        CLIP_IMAGE_STD, np.float32
    )

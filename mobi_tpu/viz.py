"""Visualisation layer: lidar-on-image overlays, BEV point-cloud views, and
training/eval collages.

Functional counterparts of the reference's primary QA surfaces:
  * overlay_lidar_on_image  — /root/reference/scripts/inference_test_bench.py:60-147
    (matplotlib scatter there; cv2 circles + TURBO colormap here, same content)
  * visualize_lidar_bev     — /root/reference/ldm/data/utils.py:280-337
  * camera_log_collage      — /root/reference/ldm/data/utils.py:374-430 /
    ddpm.py:1450-1519 row layout [GT, inpaint, (ref), sample, rec]
  * range_log_collage       — ddpm.py:1519-1520 row layout
    [input, inpaint, instance_mask, sample, rec] per channel

All functions are host-side numpy/cv2; images are RGB uint8 unless noted.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

BOX_EDGES = (
    (0, 1), (0, 3), (3, 2), (1, 2),
    (1, 5), (0, 4), (3, 7), (2, 6),
    (4, 7), (4, 5), (5, 6), (6, 7),
)


def _to_u8(img: np.ndarray, assume_pm1: bool = True) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    if assume_pm1:
        img = (img + 1.0) / 2.0
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def overlay_lidar_on_image(
    points: np.ndarray,
    lidar2image: np.ndarray,
    image: np.ndarray,
    output_path: Optional[str] = None,
    point_size: int = 2,
    clip_values=(1e-5, 1e5),
) -> np.ndarray:
    """Project lidar points onto a camera frame, colored by depth
    (reference inference_test_bench.py:60-147). Returns the overlay RGB u8."""
    import cv2

    img = _to_u8(image, assume_pm1=False).copy()
    if img.ndim == 3 and img.shape[0] == 3:
        img = img.transpose(1, 2, 0).copy()
    H, W = img.shape[:2]

    pts = np.asarray(points)[:, :3]
    hom = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    proj = hom @ np.asarray(lidar2image).reshape(4, 4).T
    keep = proj[:, 2] > 0
    proj = proj[keep]
    z = np.clip(proj[:, 2], *clip_values)
    u = proj[:, 0] / z
    v = proj[:, 1] / z
    inside = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z = u[inside], v[inside], z[inside]

    if len(z):
        z_norm = np.clip((z - z.min()) / max(z.max() - z.min(), 1e-6), 0, 1)
        colors = cv2.applyColorMap(
            (z_norm * 255).astype(np.uint8)[None], cv2.COLORMAP_TURBO
        )[0, :, ::-1]
        for x, y, c in zip(u.astype(int), v.astype(int), colors):
            cv2.circle(img, (x, y), point_size, tuple(int(q) for q in c), -1)

    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        cv2.imwrite(output_path, img[..., ::-1])
    return img


def visualize_lidar_bev(
    lidar: Optional[np.ndarray] = None,
    *,
    fpath: Optional[str] = None,
    bboxes: Optional[np.ndarray] = None,
    xlim=(-10, 10),
    ylim=(-10, 10),
    thickness: int = 1,
    bbox_color=(0, 165, 255),
    points_color=(0, 128, 128),
    dpi: int = 20,
) -> np.ndarray:
    """Top-down point/box rendering (reference data/utils.py:280-337):
    white canvas, box wireframes with an orientation arrow toward the front
    face [0,1,4,5], points as single pixels."""
    import cv2

    img = np.ones(
        (int((ylim[1] - ylim[0]) * dpi), int((xlim[1] - xlim[0]) * dpi), 3),
        dtype=np.uint8,
    ) * 255

    def to_px(p):
        return (
            int(p[0] * dpi - xlim[0] * dpi),
            int((ylim[1] - p[1]) * dpi),
        )

    if bboxes is not None and len(bboxes) > 0:
        boxes = np.asarray(bboxes)
        if boxes.ndim == 2:
            boxes = boxes[None]
        for box in boxes:
            for s, e in BOX_EDGES:
                cv2.line(img, to_px(box[s]), to_px(box[e]), bbox_color, thickness)
            center = box.mean(axis=0)
            tip = box[[0, 1, 4, 5]].mean(axis=0)
            cv2.arrowedLine(
                img, to_px(center), to_px(tip), bbox_color, thickness,
                cv2.LINE_AA, tipLength=0.1,
            )

    if lidar is not None and len(lidar):
        pts = np.asarray(lidar)[:, :2].copy()
        pts[:, 0] = (pts[:, 0] - xlim[0]) * dpi
        pts[:, 1] = (ylim[1] - pts[:, 1]) * dpi
        keep = (
            (pts[:, 0] >= 0) & (pts[:, 0] < img.shape[1])
            & (pts[:, 1] >= 0) & (pts[:, 1] < img.shape[0])
        )
        pts = pts[keep].astype(int)
        img[pts[:, 1], pts[:, 0]] = points_color

    if fpath:
        os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
        cv2.imwrite(fpath, img[..., ::-1])
    return img


def camera_log_collage(rows: Sequence[np.ndarray]) -> np.ndarray:
    """Stack [-1,1] HWC images vertically into one u8 collage
    (ddpm.py:1450-1519: GT / inpaint / ref / sample / rec rows)."""
    import cv2

    h = max(r.shape[0] for r in rows)
    w = max(r.shape[1] for r in rows)
    out = []
    for r in rows:
        u8 = _to_u8(r)
        if u8.ndim == 2:
            u8 = np.repeat(u8[..., None], 3, axis=-1)
        if u8.shape[-1] == 1:
            u8 = np.repeat(u8, 3, axis=-1)
        if u8.shape[:2] != (h, w):
            u8 = cv2.resize(u8, (w, h), interpolation=cv2.INTER_NEAREST)
        out.append(u8)
    return np.concatenate(out, axis=0)


def range_log_collage(
    gt: np.ndarray,
    inpaint: np.ndarray,
    mask: np.ndarray,
    sample: np.ndarray,
    rec: Optional[np.ndarray] = None,
    channel: int = 0,
) -> np.ndarray:
    """Per-channel range collage [input, inpaint, mask, sample(, rec)]
    (ddpm.py:1519-1520). Inputs [-1,1] HWC; returns u8 [k*H, W]."""
    rows = [gt[..., channel], inpaint[..., channel],
            mask[..., 0] * 2.0 - 1.0, sample[..., channel]]
    if rec is not None:
        rows.append(rec[..., channel])
    return np.concatenate([_to_u8(r) for r in rows], axis=0)

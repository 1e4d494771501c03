"""Detector-facing nuScenes dataset: the load-pipeline equivalent of the
reference's mmdet3d stack for EVALUATING detectors on (edited) scenes.

Covers the roles of /root/reference/bevfusion/mmdet3d/datasets/
nuscenes_dataset.py:240-314 (get_data_info with image_paths / lidar2image /
cam_types + the edited-samples swap-in) and pipelines/loading.py
(LoadPointsFromFile, LoadMultiViewImageFromFiles, LoadAnnotations3D) on top of
mobi_tpu's devkit-free table reader. Emits numpy dicts ready for a jitted
detector:

  {
    "sample_token", "points" [N, 5], "images" [6, H, W, 3] float in [-1, 1],
    "lidar2image" [6, 4, 4], "camera_intrinsics" [6, 4, 4],
    "gt_bboxes_3d" [M, 7] (lidar frame, bottom-center z),
    "gt_names" [M], "ann_tokens" [M] (instance tokens),
  }

`edited_samples_path` swaps edited sensor files in by stem (devkit
nuscenes.py:127-149 patch). `sweeps_num > 0` aggregates that many previous
(non-keyframe) lidar sweeps into the keyframe frame with a 5th time-lag
channel via `det_pipeline.load_points_multisweep` — the reference detector
eval consumes 10-sweep clouds (LoadPointsFromMultiSweeps,
loading.py:84-238; the keyframe itself is excluded from the sweep list and
kept unfiltered).
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from mobi_tpu.data.nuscenes_tables import NuScenesTables, load_lidar_points


class DetectionSceneDataset:
    def __init__(
        self,
        dataroot: str,
        version: str = "v1.0-mini",
        edited_samples_path: Optional[str] = None,
        load_images: bool = True,
        max_points: Optional[int] = None,
        sweeps_num: int = 0,
        image_size: Optional[tuple] = None,
        image_resize: Optional[float] = None,
    ):
        """image_size: when set (e.g. (256, 704), the production detector
        input), every view is deterministically resized + cropped via
        `det_pipeline.image_aug_3d(is_train=False)` — the eval half of the
        reference's ImageAug3D (transforms_3d.py:31-128; eval resize 0.48 in
        the swint det config) — and the affine is FOLDED into the returned
        `lidar2image` / `camera_intrinsics`, so downstream geometry
        (sparse depth maps, the LSS frustum) needs no separate
        img_aug_matrix. image_resize overrides the scale (default:
        max(fW/W, fH/H), which covers the canvas; pass 0.48 for strict
        reference parity on native 1600x900 nuScenes frames)."""
        self.tables = NuScenesTables(
            dataroot, version, edited_samples_path=edited_samples_path
        )
        self.load_images = load_images
        self.max_points = max_points
        self.sweeps_num = sweeps_num
        self.image_size = tuple(image_size) if image_size else None
        self.image_resize = image_resize
        self._samples = list(self.tables.samples_of_split())

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.tables.sample_record(self._samples[i])
        if self.sweeps_num > 0:
            from mobi_tpu.data.det_pipeline import load_points_multisweep

            points = load_points_multisweep(
                rec, sweeps_num=self.sweeps_num
            ).astype(np.float32)
        else:
            points = load_lidar_points(rec["lidar_path"]).astype(np.float32)
        if self.max_points is not None:
            # fixed-shape clouds for jitted detectors: random subsample or
            # zero-pad with an out-of-range sentinel
            n = len(points)
            if n > self.max_points:
                sel = np.random.default_rng(i).choice(
                    n, self.max_points, replace=False
                )
                points = points[sel]
            elif n < self.max_points:
                pad = np.full(
                    (self.max_points - n, points.shape[1]), 1e4, np.float32
                )
                points = np.concatenate([points, pad])

        out: Dict[str, Any] = {
            "sample_token": rec["sample_token"],
            "points": points,
            "lidar2image": rec["lidar2image_transforms"].astype(np.float32),
            "camera2lidar": np.linalg.inv(
                rec["lidar2camera_transforms"]
            ).astype(np.float32)
            if len(rec["lidar2camera_transforms"])
            else np.zeros((0, 4, 4), np.float32),
            "camera_intrinsics": rec["camera_intrinsics"].astype(np.float32),
            "cam_types": rec["cam_types"],
            "lidar2global": np.asarray(rec["lidar2global"], np.float64),
            "gt_bboxes_3d": rec["gt_bboxes_3d"].astype(np.float32),
            "gt_velocity": rec["gt_velocity"].astype(np.float32),
            "gt_names": list(rec["gt_names"]),
            "ann_tokens": list(rec["ann_tokens"]),
        }
        if self.load_images:
            from PIL import Image

            imgs: List[np.ndarray] = []
            for p in rec["image_paths"]:
                with Image.open(p) as im:
                    arr = np.asarray(im.convert("RGB"), np.float32)
                imgs.append(arr / 127.5 - 1.0)
            if imgs:
                images = np.stack(imgs)
                if self.image_size is not None:
                    from mobi_tpu.data.det_pipeline import fold_img_aug

                    images, aug = self._resize_views(images)
                    out["img_aug_matrix"] = aug
                    out["lidar2image"], out["camera_intrinsics"] = (
                        fold_img_aug(
                            out["lidar2image"], out["camera_intrinsics"], aug
                        )
                    )
                out["images"] = images
        return out

    def _resize_views(self, images: np.ndarray):
        from mobi_tpu.data.det_pipeline import image_aug_3d

        fH, fW = self.image_size
        H, W = images.shape[1:3]
        r = self.image_resize or max(fH / H, fW / W)
        return image_aug_3d(
            images, rng=None, final_dim=(fH, fW), resize_lim=(r, r),
            bot_pct_lim=(0.0, 0.0), rot_lim=(0.0, 0.0), rand_flip=False,
            is_train=False,
        )

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i in range(len(self)):
            yield self[i]

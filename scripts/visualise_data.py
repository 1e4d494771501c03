#!/usr/bin/env python
"""Dump per-sample data-sanity visualisations from the MObI dataset.

Reference counterpart: /root/reference/scripts/visualise_data.py:45-131 —
for a handful of dataset samples, writes the camera GT/inpaint pair, the
reference crop, the range view (depth+intensity), the range inpaint mask,
and a BEV rendering of the object box.

Usage:
  python scripts/visualise_data.py --config configs/mobi_nusc_512.yaml \
      --split train --num 8 --outdir results/data_vis
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _save(path: str, img_pm1: np.ndarray):
    import cv2

    u8 = np.clip((np.asarray(img_pm1) + 1) * 127.5, 0, 255).astype(np.uint8)
    if u8.ndim == 2:
        u8 = u8[..., None].repeat(3, -1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, u8[..., ::-1] if u8.shape[-1] == 3 else u8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--outdir", default="results/data_vis")
    args = p.parse_args()

    from mobi_tpu.utils.config import instantiate_from_config, load_config
    from mobi_tpu.viz import range_log_collage, visualize_lidar_bev

    cfg = load_config(args.config)
    ds = instantiate_from_config(cfg["data"]["params"][args.split])
    n = min(args.num, len(ds))
    print(f"writing {n} sample visualisations to {args.outdir}")
    for i in range(n):
        ex = ds[i]
        d = os.path.join(args.outdir, f"{i:03d}")
        img = ex["image"]
        _save(os.path.join(d, "gt.png"), img["GT"])
        _save(os.path.join(d, "inpaint.png"), img["inpaint_image"])
        _save(os.path.join(d, "mask.png"), img["inpaint_mask"][..., 0] * 2 - 1)
        if "cond" in img and "ref_image" in img["cond"]:
            ref = np.asarray(img["cond"]["ref_image"])
            ref = (ref - ref.min()) / max(ref.max() - ref.min(), 1e-6) * 2 - 1
            _save(os.path.join(d, "ref.png"), ref)
        if "lidar" in ex:
            lid = ex["lidar"]
            collage = range_log_collage(
                np.asarray(lid["range_data"]),
                np.asarray(lid["range_data_inpaint"]),
                np.asarray(lid["range_mask"]),
                np.asarray(lid["range_data"]),
            )
            import cv2

            os.makedirs(d, exist_ok=True)
            cv2.imwrite(os.path.join(d, "range.png"), collage[..., ::-1])
            _save(os.path.join(d, "range_mask.png"),
                  lid["range_mask"][..., 0] * 2 - 1)
        if "bbox_3d" in ex:
            visualize_lidar_bev(
                bboxes=np.asarray(ex["bbox_3d"])[None, :, :2],
                fpath=os.path.join(d, "bev.png"),
                xlim=(-54, 54), ylim=(-54, 54), dpi=5,
            )
    print("done")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""BEVFusion detector training CLI — the tools/train.py equivalent.

Reference counterpart: /root/reference/bevfusion/tools/train.py (mmcv runner
over the convfuser/voxelnet configs, launched via torchpack dist-run). Here:
DetectionSceneDataset + the det_pipeline augmentations feed the jitted
TransFusion train step; checkpoints go through orbax.

Usage:
  python scripts/train_detector.py --dataroot /data/nuscenes \
      --version v1.0-mini --max-steps 1000 --logdir runs/det \
      [--camera] [--gt-db path/to/gt_db_infos.pkl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUSC_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--logdir", default="runs/detector")
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--max-gt", type=int, default=128)
    p.add_argument("--max-voxels", type=int, default=120000)
    p.add_argument("--sweeps", type=int, default=9)
    p.add_argument("--camera", action="store_true",
                   help="train the camera+lidar fusion variant")
    p.add_argument("--gt-db", default=None,
                   help="gt_db_infos.pkl for paste augmentation")
    p.add_argument("--calibrate", type=int, default=8,
                   help="derive static voxel caps from this many sample "
                        "clouds (0 = use default_static_caps)")
    p.add_argument("--batch-size", type=int, default=1,
                   help=">1 uses the vmapped batched train step (static-cap "
                        "plans share one compiled program across samples)")
    p.add_argument("--image-aug", action="store_true",
                   help="random per-view ImageAug3D on the camera branch "
                        "(affines folded into the projection matrices)")
    p.add_argument("--grid-mask", type=float, default=0.0,
                   help="GridMask occlusion probability on camera views")
    p.add_argument("--save-every", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import numpy as np

    from mobi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mobi_tpu.data.det_pipeline import GTDatabaseSampler, train_pipeline
    from mobi_tpu.data.detection_dataset import DetectionSceneDataset
    from mobi_tpu.models.bevfusion import (
        BEVFusionDetector,
        calibrate_static_caps,
        default_static_caps,
        prepare_lidar_inputs,
    )
    from mobi_tpu.models.detector_training import (
        make_detector_optimizer,
        make_detector_train_step,
        pad_gt,
    )

    os.makedirs(args.logdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    dataset = DetectionSceneDataset(
        args.dataroot, args.version, load_images=args.camera,
        image_size=(256, 704) if args.camera else None,
    )
    sampler = (
        GTDatabaseSampler(
            args.gt_db,
            sample_groups={"car": 2, "truck": 3, "bus": 4, "trailer": 6,
                           "construction_vehicle": 7, "traffic_cone": 2,
                           "barrier": 6, "motorcycle": 6, "bicycle": 6,
                           "pedestrian": 2},
        )
        if args.gt_db else None
    )

    detector = BEVFusionDetector(use_camera=args.camera)
    tx = make_detector_optimizer(args.lr, total_steps=args.max_steps)
    if args.batch_size > 1:
        from mobi_tpu.models.detector_training import (
            make_batched_detector_train_step,
        )

        step_fn = make_batched_detector_train_step(detector, tx)
    else:
        step_fn = make_detector_train_step(detector, tx)

    if args.calibrate > 0:
        # data-derived caps: real lidar contracts ~2-4x per stride-2 level
        # (default_static_caps' schedule) but other distributions can
        # expand at transitions; calibration makes the static plan robust
        # to whatever this dataset actually contains.
        n_cal = min(args.calibrate, len(dataset))
        cal_clouds = [
            train_pipeline(
                dataset.tables.sample_record(dataset._samples[i]),
                NUSC_CLASSES, np.random.default_rng(args.seed + i),
                sweeps_num=args.sweeps, sampler=sampler,
            )["points"]
            for i in range(n_cal)
        ]
        static_caps = calibrate_static_caps(
            cal_clouds, max_voxels=args.max_voxels
        )
        print(f"calibrated static caps from {n_cal} clouds: {static_caps}")
    else:
        static_caps = default_static_caps(args.max_voxels)

    def make_batch(i):
        rec = dataset.tables.sample_record(dataset._samples[i % len(dataset)])
        ex = train_pipeline(
            rec, NUSC_CLASSES, rng, sweeps_num=args.sweeps, sampler=sampler
        )
        feats, plans, out_coords, out_shape = prepare_lidar_inputs(
            ex["points"], max_voxels=args.max_voxels, static_caps=static_caps
        )
        b, l, m = pad_gt(ex["gt_bboxes_3d"], ex["gt_labels_3d"], args.max_gt)
        batch = {
            "voxel_feats": feats,
            "plans": plans,
            "out_coords": out_coords,
            "gt_boxes": b[None],
            "gt_labels": l[None],
            "gt_mask": m[None],
        }
        if args.camera:
            from mobi_tpu.models.detector_training import camera_batch_inputs

            batch.update(camera_batch_inputs(
                ex["points"], ex["lidar_aug_matrix"],
                dataset[i % len(dataset)], rng=rng,
                image_aug=args.image_aug, grid_mask_prob=args.grid_mask,
            ))
        return batch, out_shape

    print(f"initializing detector params ({len(dataset)} samples)")
    b0, out_shape = make_batch(0)
    with jax.default_device(jax.devices("cpu")[0]):
        params = detector.init(
            jax.random.PRNGKey(args.seed),
            b0["voxel_feats"], b0["plans"], b0["out_coords"], out_shape,
            images=b0.get("images"), depth_map=b0.get("depth_map"),
            cam2lidar=b0.get("cam2lidar"), intrins=b0.get("intrins"),
        )["params"]
    opt_state = tx.init(params)

    metrics_path = os.path.join(args.logdir, "metrics.jsonl")
    t0 = time.time()
    for step in range(1, args.max_steps + 1):
        if args.batch_size > 1:
            from mobi_tpu.models.detector_training import (
                stack_detector_batches,
            )

            parts = [make_batch(step * args.batch_size + j)
                     for j in range(args.batch_size)]
            out_shape = parts[0][1]
            batch = stack_detector_batches([p[0] for p in parts])
        else:
            batch, out_shape = make_batch(step)
        params, opt_state, m = step_fn(params, opt_state, batch, out_shape)
        if step % 10 == 0:
            m = {k: float(v) for k, v in m.items()}
            m.update(step=step, wall_s=time.time() - t0)
            with open(metrics_path, "a") as f:
                f.write(json.dumps(m) + "\n")
            print(f"step {step} loss {m['loss']:.4f} "
                  f"(cls {m['loss_cls']:.3f} bbox {m['loss_bbox']:.3f} "
                  f"hm {m['loss_heatmap']:.3f} pos {m['num_pos']:.0f})")
        if step % args.save_every == 0 or step == args.max_steps:
            import pickle

            with open(os.path.join(args.logdir, f"ckpt_{step}.pkl"), "wb") as f:
                pickle.dump(jax.device_get(params), f)
    print("done")


if __name__ == "__main__":
    main()

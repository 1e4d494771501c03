"""TPU drive of the checkpoint-driven detection-eval workflow at the
PRODUCTION grid (0.075 voxels, 1440x1440x41 sparse shape, 180x180 BEV):

  1. fabricate a full-size lidar-only BEVFusionDetector param tree
     (eval_shape + random fill; no forward compute on the 1-core host),
  2. save it as a reference-format .pth via export_bevfusion,
  3. run `scripts/detection_eval.py --checkpoint` over a synthetic raw
     nuScenes tree with 2-sweep aggregated clouds — import, static-caps
     calibration, jitted TPU forward, results.json, detection metrics.

Timing/evidence recorded in PROFILE.md. Run with the tunnel otherwise idle:
  nohup /opt/venv/bin/python -u scripts/tpu_detection_eval_drive.py \
      > /tmp/det_eval_drive.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T0 = time.time()


def log(msg):
    print(f"# {time.time() - T0:7.1f}s {msg}", flush=True)


def random_fill(tree, rng):
    if hasattr(tree, "items"):
        return {k: random_fill(v, rng) for k, v in tree.items()}
    a = rng.normal(0, 0.05, tree.shape).astype(np.float32)
    return a


def positive_vars(tree, key=""):
    if hasattr(tree, "items"):
        return {k: positive_vars(v, k) for k, v in tree.items()}
    return np.abs(tree) + 0.5 if key.endswith("_var") else tree


def main():
    import argparse

    import jax

    from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw
    from mobi_tpu.export_bevfusion import save_reference_checkpoint
    from mobi_tpu.models.bevfusion import (
        BEVFusionDetector,
        build_sparse_depth_map,
        prepare_lidar_inputs,
    )
    from mobi_tpu.utils.cache import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--use-camera", action="store_true",
                    help="drive the camera+lidar fusion model (Swin-T + "
                         "LSS) instead of the lidar-only voxelnet")
    ap.add_argument("--max-samples", type=int, default=6)
    args = ap.parse_args()

    enable_compilation_cache()
    workdir = "/tmp/det_eval_drive_cam" if args.use_camera else "/tmp/det_eval_drive"
    os.makedirs(workdir, exist_ok=True)

    log("building synthetic raw nuScenes tree (2 scenes x 3 samples)")
    root = os.path.join(workdir, "raw")
    if not os.path.exists(os.path.join(root, "v1.0-mini")):
        build_synthetic_nuscenes_raw(root, num_scenes=2, samples_per_scene=3)

    kind = "camera+lidar" if args.use_camera else "lidar-only"
    log(f"fabricating full-size {kind} detector params (eval_shape)")
    rng = np.random.default_rng(7)
    pts = np.concatenate(
        [
            rng.uniform(-50, 50, (9000, 2)),
            rng.uniform(-2.0, 0.5, (9000, 1)),
            rng.uniform(0, 1, (9000, 2)),
        ],
        axis=1,
    ).astype(np.float32)
    feats, plans, oc, oshape = prepare_lidar_inputs(pts)  # production grid
    kw = {}
    if args.use_camera:
        # production camera geometry: 6 views at (256, 704), stride-8 feats
        l2i = np.stack([np.eye(4, dtype=np.float32)] * 6)
        l2i[:, 0, 0] = l2i[:, 1, 1] = 500.0
        kw = dict(
            images=np.zeros((6, 256, 704, 3), np.float32),
            depth_map=build_sparse_depth_map(pts[:, :3], l2i, (256, 704)),
            cam2lidar=np.stack([np.eye(4, dtype=np.float32)] * 6),
            intrins=np.stack([np.eye(3, dtype=np.float32) * 500.0] * 6),
        )
    det = BEVFusionDetector(use_camera=args.use_camera)
    with jax.default_device(jax.devices("cpu")[0]):
        # close over plans/out_shape: they are static host-side structures
        # (eval_shape would abstract the out_shape ints and break tracing)
        shapes = jax.eval_shape(
            lambda r: det.init(r, feats, plans, oc, oshape, **kw),
            jax.random.PRNGKey(0),
        )["params"]
    params = positive_vars(random_fill(shapes, rng))
    n_params = sum(np.asarray(v).size for v in jax.tree.leaves(params))
    log(f"param tree: {n_params / 1e6:.1f}M params")

    ckpt = save_reference_checkpoint(
        params, os.path.join(workdir, "det_fabricated.pth"),
        use_camera=args.use_camera,
    )
    log(f"reference-format checkpoint written: {ckpt}")

    sys.path.insert(0, os.path.dirname(__file__))
    import detection_eval

    results = os.path.join(workdir, "results.json")
    t_inf = time.time()
    cli = [
        "--dataroot", root, "--results", results,
        "--out-dir", os.path.join(workdir, "out"),
        "--checkpoint", ckpt, "--sweeps-num", "2",
        "--max-samples", str(args.max_samples), "--verbose-inference",
    ]
    if args.use_camera:
        cli.append("--use-camera")
    metrics = detection_eval.main(cli)
    log(f"inference+eval done in {time.time() - t_inf:.1f}s; "
        f"mAP={metrics['mean_ap']:.4f} NDS={metrics['nd_score']:.4f}")
    log("DRIVE COMPLETE")


if __name__ == "__main__":
    main()

"""End-to-end detection-eval plumbing on a synthetic raw nuScenes tree:
GT loading through NuScenesTables (global frame, instance-token track ids),
edited-samples file swap, and the detection_eval CLI with and without
edited_objects_restrict (reference docs/edited-objects-eval.md:20-33)."""
import json
import os

import numpy as np
import pytest

from mobi_tpu.data.nuscenes_tables import NuScenesTables
from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw
from mobi_tpu.eval.detection import load_gt_from_tables, DetBox


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc_raw"))
    build_synthetic_nuscenes_raw(root, num_scenes=1, samples_per_scene=2)
    return root


def test_load_gt_from_tables(raw_root):
    tables = NuScenesTables(raw_root, "v1.0-mini")
    gt, ego = load_gt_from_tables(tables)
    assert len(gt) == 2
    for token, boxes in gt.items():
        assert token in ego
        assert len(boxes) > 0
        for b in boxes:
            assert b.detection_name in ("car", "pedestrian")
            assert b.tracking_id  # instance token
            assert len(b.translation) == 3


def test_edited_samples_file_swap(raw_root):
    """NuScenesTables(edited_samples_path=...) must resolve sensor files to
    the edited copies by stem (devkit nuscenes.py:127-149 patch)."""
    plain = NuScenesTables(raw_root, "v1.0-mini")
    sample = next(plain.samples_of_split())
    rec = plain.sample_record(sample)
    lidar_name = os.path.basename(rec["lidar_path"])

    edited_dir = os.path.join(raw_root, "samples-edited")
    os.makedirs(edited_dir, exist_ok=True)
    edited_file = os.path.join(edited_dir, lidar_name.split(".")[0] + ".npy")
    np.save(edited_file, np.zeros((10, 5), np.float32))

    swapped = NuScenesTables(
        raw_root, "v1.0-mini", edited_samples_path="samples-edited"
    )
    rec2 = swapped.sample_record(next(swapped.samples_of_split()))
    assert rec2["lidar_path"] == edited_file
    # other samples keep their original files
    recs = [swapped.sample_record(s) for s in swapped.samples_of_split()]
    assert recs[1]["lidar_path"] != edited_file


def test_detection_scene_dataset(raw_root):
    from mobi_tpu.data.detection_dataset import DetectionSceneDataset

    ds = DetectionSceneDataset(raw_root, "v1.0-mini", max_points=512)
    assert len(ds) == 2
    s = ds[0]
    assert s["points"].shape == (512, 4)
    assert s["lidar2image"].shape[1:] == (4, 4)
    assert s["gt_bboxes_3d"].shape[1] == 7
    assert len(s["gt_names"]) == len(s["ann_tokens"]) == len(s["gt_bboxes_3d"])
    assert s["images"].ndim == 4 and s["images"].shape[-1] == 3
    assert -1.0 <= s["images"].min() and s["images"].max() <= 1.0


def _write_results(gt, path, jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    results = {}
    for token, boxes in gt.items():
        dets = []
        for b in boxes:
            t = np.asarray(b.translation) + rng.normal(0, jitter, 3)
            dets.append({
                "sample_token": token,
                "translation": [float(v) for v in t],
                "size": list(b.size),
                "rotation": [float(np.cos(b.yaw / 2)), 0.0, 0.0,
                             float(np.sin(b.yaw / 2))],
                "velocity": [0.0, 0.0],
                "detection_name": b.detection_name,
                "detection_score": float(rng.uniform(0.5, 1.0)),
                "attribute_name": b.attribute_name,
            })
        results[token] = dets
    with open(path, "w") as f:
        json.dump({"meta": {}, "results": results}, f)


def test_detection_eval_cli_end_to_end(raw_root, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import detection_eval

    tables = NuScenesTables(raw_root, "v1.0-mini")
    gt, _ = load_gt_from_tables(tables)
    results_path = str(tmp_path / "results.json")
    _write_results(gt, results_path, jitter=0.05)

    out_dir = str(tmp_path / "out")
    metrics = detection_eval.main([
        "--dataroot", raw_root, "--results", results_path,
        "--out-dir", out_dir,
    ])
    assert os.path.exists(os.path.join(out_dir, "metrics_summary.json"))
    assert metrics["label_aps"]["car"][4.0] > 0.8
    assert 0 <= metrics["nd_score"] <= 1

    # restricted mode: mark every first GT object of each sample as edited
    edited_dir = os.path.join(raw_root, "samples-edited")
    os.makedirs(edited_dir, exist_ok=True)
    objects = {t: [bl[0].tracking_id] for t, bl in gt.items() if bl}
    with open(os.path.join(edited_dir, "objects.json"), "w") as f:
        json.dump(objects, f)
    metrics_r = detection_eval.main([
        "--dataroot", raw_root, "--results", results_path,
        "--out-dir", str(tmp_path / "out_r"),
        "--edited-samples-path", "samples-edited",
        "--edited-objects-restrict",
    ])
    assert metrics_r["mean_ap"] == 0.0  # reported as 0 in restricted mode
    assert np.isfinite(metrics_r["tp_errors"]["trans_err"])
    # per-class: only the edited objects' small jitter accumulates
    assert metrics_r["label_tp_errors"]["car"]["trans_err"] < 0.2


def test_detection_dataset_image_resize_folds_projection(raw_root):
    """With image_size set, the eval loader resizes views deterministically
    and folds the affine into lidar2image/camera_intrinsics: a 3D point's
    pixel position under the folded matrix must equal affine(original
    pixel), and K' == A @ K (ImageAug3D eval semantics,
    transforms_3d.py:31-128, with the matrix pre-composed)."""
    from mobi_tpu.data.detection_dataset import DetectionSceneDataset

    plain = DetectionSceneDataset(raw_root, load_images=True, sweeps_num=0)
    sized = DetectionSceneDataset(
        raw_root, load_images=True, sweeps_num=0, image_size=(128, 352)
    )
    a, b = plain[0], sized[0]
    assert b["images"].shape[1:3] == (128, 352)
    assert "img_aug_matrix" in b

    p = np.array([5.0, 1.0, 0.0, 1.0])  # a lidar-frame point
    for v in range(a["lidar2image"].shape[0]):
        uvd = a["lidar2image"][v] @ p
        if uvd[2] < 0.5:
            continue  # behind this camera
        u, vv = uvd[0] / uvd[2], uvd[1] / uvd[2]
        aug = b["img_aug_matrix"][v]
        expect = aug[:2, :2] @ np.array([u, vv]) + aug[:2, 3]
        uvd2 = b["lidar2image"][v] @ p
        got = uvd2[:2] / uvd2[2]
        np.testing.assert_allclose(got, expect, atol=1e-3)
        # intrinsics folded the same way
        A = np.eye(3)
        A[:2, :2] = aug[:2, :2]
        A[:2, 2] = aug[:2, 3]
        np.testing.assert_allclose(
            b["camera_intrinsics"][v][:3, :3],
            A @ a["camera_intrinsics"][v][:3, :3], atol=1e-3,
        )

"""End-to-end preprocessing over a synthetic raw-nuScenes layout, then the
dataset consuming its outputs — the full offline data path."""
import numpy as np
import pytest

from mobi_tpu.data.nuscenes import NuScenesDataset
from mobi_tpu.data.nuscenes_tables import (
    NuScenesTables,
    box7d_to_corners,
    load_lidar_points,
    quat_to_rot,
)
from mobi_tpu.data.preprocess import build_pbe_database, check_erase_bbox
from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc_raw")
    return build_synthetic_nuscenes_raw(str(root))


@pytest.fixture(scope="module")
def db(raw, tmp_path_factory):
    out = tmp_path_factory.mktemp("processed")
    return build_pbe_database(raw, str(out), split="train", num_erase=2)


def test_quat_identity():
    np.testing.assert_allclose(quat_to_rot([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    # 90deg about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = quat_to_rot(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_box7d_corners_convention():
    box = np.array([10.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0])
    c = box7d_to_corners(box)
    assert c.shape == (8, 3)
    # bottom z at z_bottom, top at z_bottom + h
    np.testing.assert_allclose(c[[0, 3, 4, 7], 2], -1.0)
    np.testing.assert_allclose(c[[1, 2, 5, 6], 2], 0.5)
    # x extent = length
    np.testing.assert_allclose(c[:, 0].max() - c[:, 0].min(), 4.0)
    np.testing.assert_allclose(c[:, 1].max() - c[:, 1].min(), 2.0)
    # edge basis at corner 0 is orthogonal (required by points_in_bbox_corners)
    e = np.stack([c[1] - c[0], c[3] - c[0], c[4] - c[0]])
    gram = e @ e.T
    assert abs(gram[0, 1]) < 1e-9 and abs(gram[0, 2]) < 1e-9 and abs(gram[1, 2]) < 1e-9


def test_tables_sample_records(raw):
    t = NuScenesTables(raw)
    samples = list(t.samples_of_split())
    assert len(samples) == 2
    rec = t.sample_record(samples[0])
    assert len(rec["image_paths"]) == 6
    assert rec["lidar2image_transforms"].shape == (6, 4, 4)
    assert rec["gt_bboxes_3d_corners"].shape[1:] == (8, 3)
    assert set(rec["gt_names"]) <= {"car", "pedestrian"}
    pts = load_lidar_points(rec["lidar_path"])
    assert pts.shape[1] == 4 and len(pts) > 5000


def test_build_database_outputs(db):
    import pandas as pd
    import pickle

    df = pd.read_csv(db["object_database_path"], index_col=0)
    needed = {
        "track_id", "scene_token", "timestamp", "cam_idx", "scene_obj_idx",
        "object_class", "camera_visibility_mask", "max_iou_overlap",
        "reference_image_h", "reference_image_w", "num_lidar_points",
        "is_raining", "is_night", "is_erase_box", "max_distance", "min_distance",
    }
    assert needed <= set(df.columns)
    assert (df["is_erase_box"].sum()) == 2
    assert df["camera_visibility_mask"].between(0, 1).all()

    with open(db["scene_database_path"], "rb") as f:
        scenes = pickle.load(f)
    info = next(iter(scenes.values()))
    depth = np.load(info["range_depth_path"])
    assert depth.shape == (32, 1096)
    inst = np.load(info["range_instance_mask_path"])
    assert set(np.unique(inst)) >= {-1.0}
    # objects got instance pixels
    assert (inst >= 0).sum() > 10


def test_dataset_consumes_preprocessed_db(db):
    ds = NuScenesDataset(
        state="train",
        object_classes=["car", "pedestrian"],
        use_camera=True,
        use_lidar=True,
        image_height=64,
        image_width=64,
        range_height=64,
        range_width=64,
        ref_aug=False,
        range_int_norm=True,
        min_lidar_points=1,
        reference_image_min_h=1,
        reference_image_min_w=1,
        camera_visibility_min=0.0,
        num_samples_per_class=2,
        fixed_sampling=True,
        seed=0,
        **db,
    )
    s = ds[0]
    assert s["image"]["GT"].shape == (64, 64, 3)
    assert s["lidar"]["range_data"].shape == (64, 64, 2)
    assert np.isfinite(s["lidar"]["range_data"]).all()


def test_check_erase_bbox_rejects_overlap():
    base = box7d_to_corners(np.array([10.0, 0, -1, 4, 2, 1.5, 0]))
    overlapping = box7d_to_corners(np.array([11.0, 0, -1, 4, 2, 1.5, 0]))
    clear = box7d_to_corners(np.array([10.0, 20, -1, 4, 2, 1.5, 0]))
    assert not check_erase_bbox(np.stack([base, overlapping]))
    assert check_erase_bbox(np.stack([base, clear]))

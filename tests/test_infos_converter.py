"""infos-pkl converter on the synthetic raw nuScenes tree: schema and
geometric consistency with NuScenesTables.sample_record."""
import pickle

import numpy as np
import pytest

from mobi_tpu.data.infos_converter import create_nuscenes_infos
from mobi_tpu.data.nuscenes_tables import NuScenesTables, quat_to_rot
from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc_infos"))
    build_synthetic_nuscenes_raw(root, num_scenes=1, samples_per_scene=2)
    return root


def test_infos_schema_and_boxes(raw_root, tmp_path):
    paths = create_nuscenes_infos(
        raw_root, str(tmp_path), "v1.0-mini",
        train_scene_names=["scene-0000"], val_scene_names=[],
    )
    with open(paths["train"], "rb") as f:
        data = pickle.load(f)
    assert data["metadata"]["version"] == "v1.0-mini"
    infos = data["infos"]
    assert len(infos) == 2

    info = infos[0]
    for key in (
        "lidar_path", "token", "sweeps", "cams", "lidar2ego_translation",
        "ego2global_rotation", "timestamp", "location", "description",
        "gt_boxes", "gt_names", "gt_name_descriptions", "gt_velocity",
        "num_lidar_pts", "num_radar_pts", "valid_flag", "ann_tokens",
    ):
        assert key in info, key
    n = len(info["gt_boxes"])
    assert info["gt_boxes"].shape == (n, 7)
    assert info["gt_velocity"].shape == (n, 2)
    assert len(info["gt_names"]) == n == len(info["ann_tokens"])

    cams = info["cams"]
    assert len(cams) == 6
    for cam, rec in cams.items():
        assert rec["sensor2lidar_rotation"].shape == (3, 3)
        assert rec["camera_intrinsics"].shape == (3, 3)
        # rotation is orthonormal
        np.testing.assert_allclose(
            rec["sensor2lidar_rotation"] @ rec["sensor2lidar_rotation"].T,
            np.eye(3), atol=1e-6,
        )


def test_infos_boxes_match_table_reader(raw_root, tmp_path):
    """SECOND-format boxes must be consistent with sample_record's lidar-frame
    boxes: same centers (bottom z + h/2), sizes swapped (w,l) vs (l,w), and
    yaw related by -yaw - pi/2."""
    paths = create_nuscenes_infos(
        raw_root, str(tmp_path), "v1.0-mini",
        train_scene_names=["scene-0000"], val_scene_names=[],
    )
    with open(paths["train"], "rb") as f:
        infos = pickle.load(f)["infos"]
    tables = NuScenesTables(raw_root, "v1.0-mini")
    recs = {
        s["token"]: tables.sample_record(s) for s in tables.samples_of_split()
    }
    for info in infos:
        rec = recs[info["token"]]
        assert len(info["gt_boxes"]) == len(rec["gt_bboxes_3d"])
        for ib, tb in zip(info["gt_boxes"], rec["gt_bboxes_3d"]):
            # table boxes: [x, y, z_bottom, l, w, h, yaw]
            np.testing.assert_allclose(ib[:2], tb[:2], atol=1e-6)
            np.testing.assert_allclose(ib[2], tb[2] + tb[5] / 2, atol=1e-6)
            np.testing.assert_allclose(ib[3], tb[4], atol=1e-6)  # w
            np.testing.assert_allclose(ib[4], tb[3], atol=1e-6)  # l
            np.testing.assert_allclose(ib[5], tb[5], atol=1e-6)  # h
            d = (ib[6] - (-tb[6] - np.pi / 2) + np.pi) % (2 * np.pi) - np.pi
            assert abs(d) < 1e-6


def test_infos_respects_split_names(raw_root, tmp_path):
    paths = create_nuscenes_infos(
        raw_root, str(tmp_path / "s"), "v1.0-mini",
        train_scene_names=[], val_scene_names=["scene-0000"],
    )
    with open(paths["train"], "rb") as f:
        assert len(pickle.load(f)["infos"]) == 0
    with open(paths["val"], "rb") as f:
        assert len(pickle.load(f)["infos"]) == 2


def test_box_velocity_devkit_semantics(raw_root):
    """box_velocity matches the devkit's centered finite difference
    (nuscenes.py:403-449) on the synthetic prev/next annotation chains, and
    sample_record emits the lidar-frame rotation of it."""
    tables = NuScenesTables(raw_root, "v1.0-mini")
    anns = tables.tables["sample_annotation"]
    # an annotation with both neighbors missing -> nan
    lonely = [a for a in anns if not a.get("prev") and not a.get("next")]
    chained = [a for a in anns if a.get("prev") or a.get("next")]
    assert chained, "synthetic tables should chain annotations"
    for a in chained:
        vel = tables.box_velocity(a["token"])
        assert np.all(np.isfinite(vel))
        first = tables.index["sample_annotation"][a["prev"]] if a.get("prev") else a
        last = tables.index["sample_annotation"][a["next"]] if a.get("next") else a
        dt = 1e-6 * (
            tables.index["sample"][last["sample_token"]]["timestamp"]
            - tables.index["sample"][first["sample_token"]]["timestamp"]
        )
        want = (np.asarray(last["translation"]) - np.asarray(first["translation"])) / dt
        np.testing.assert_allclose(vel, want, rtol=1e-6)
    for a in lonely:
        assert np.all(np.isnan(tables.box_velocity(a["token"])))

    sample = tables.index["sample"][anns[0]["sample_token"]]
    rec = tables.sample_record(sample)
    n = len(rec["gt_bboxes_3d"])
    assert rec["gt_velocity"].shape == (n, 2)
    # synthetic ego pose is identity, so lidar-frame velocity == global xy
    for tok, v in zip(rec["ann_tokens"], rec["gt_velocity"]):
        ann = next(a for a in anns if a["instance_token"] == tok
                   and a["sample_token"] == sample["token"])
        want = tables.box_velocity(ann["token"])[:2]
        if np.all(np.isfinite(want)):
            np.testing.assert_allclose(v, want, rtol=1e-5)

"""NuScenesDataset over the synthetic mini-database."""
import numpy as np
import pytest

from mobi_tpu.data.nuscenes import NuScenesDataset, collate
from mobi_tpu.data.synthetic import build_synthetic_database


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdb")
    return build_synthetic_database(str(root))


def make_ds(db, **kw):
    args = dict(
        state="train",
        object_classes=["car", "pedestrian"],
        use_camera=True,
        use_lidar=True,
        image_height=128,
        image_width=128,
        range_height=128,
        range_width=128,
        ref_aug=False,
        range_int_norm=True,
        min_lidar_points=1,
        reference_image_min_h=1,
        reference_image_min_w=1,
        num_samples_per_class=4,
        fixed_sampling=True,
        seed=0,
        **db,
    )
    args.update(kw)
    return NuScenesDataset(**args)


def test_sample_schema_and_shapes(db):
    ds = make_ds(db)
    assert len(ds) == 8
    s = ds[0]
    img = s["image"]
    assert img["GT"].shape == (128, 128, 3)
    assert img["inpaint_image"].shape == (128, 128, 3)
    assert img["inpaint_mask"].shape == (128, 128, 1)
    assert img["cond"]["ref_image"].shape == (224, 224, 3)
    assert img["cond"]["ref_bbox"].shape == (8, 3)
    lid = s["lidar"]
    assert lid["range_data"].shape == (128, 128, 2)
    assert lid["range_mask"].shape == (128, 128, 1)
    assert lid["cond"]["ref_bbox"].shape == (8, 3)
    assert s["bbox_3d"].shape == (8, 3)
    # mask is binary away from boundaries (bilinear-resize AA edges match the
    # reference's torchvision Resize of the fillPoly mask)
    m = img["inpaint_mask"]
    assert m.min() >= 0 and m.max() <= 1
    assert ((m < 0.01) | (m > 0.99)).mean() > 0.9
    assert (m < 0.5).any() and (m > 0.5).any()
    # values in [-1, 1]
    assert img["GT"].min() >= -1 and img["GT"].max() <= 1
    assert lid["range_data"].min() >= -1 - 1e-6 and lid["range_data"].max() <= 1 + 1e-6


def test_inpaint_consistency(db):
    ds = make_ds(db)
    s = ds[1]
    img = s["image"]
    np.testing.assert_allclose(
        img["inpaint_image"], img["GT"] * img["inpaint_mask"], atol=1e-6
    )
    lid = s["lidar"]
    np.testing.assert_allclose(
        lid["range_data_inpaint"], lid["range_data"] * lid["range_mask"], atol=1e-6
    )
    # the object instance pixels must fall inside the masked (0) region
    inst = lid["range_instance_mask"][..., 0] > 0
    if inst.any():
        masked_frac = (lid["range_mask"][..., 0][inst] == 0).mean()
        assert masked_frac > 0.8


def test_camera_bbox_shares_lidar_depth(db):
    ds = make_ds(db)
    s = ds[2]
    np.testing.assert_allclose(
        s["image"]["cond"]["ref_bbox"][..., 2],
        s["lidar"]["cond"]["ref_bbox"][..., 2],
        atol=0,
    )


def test_erase_ref_zeroes_conditioning(db):
    ds = make_ds(db, ref_mode="erase-ref")
    s = ds[0]
    np.testing.assert_allclose(s["image"]["cond"]["ref_bbox"], 0.0)
    np.testing.assert_allclose(s["lidar"]["cond"]["ref_bbox"], 0.0)
    assert s["ref_class"] == "empty"


def test_ref_modes_select_valid_rows(db):
    for mode in ["id-ref", "track-ref", "in-domain-ref", "cross-domain-ref", "same-ref"]:
        ds = make_ds(db, ref_mode=mode)
        s = ds[0]
        assert s["image"]["cond"]["ref_image"].shape == (224, 224, 3)


def test_rotation_test_expansion(db):
    ds = make_ds(db, rot_every_angle=90, num_samples_per_class=2)
    # 2 classes x 2 per class x 4 angles
    assert len(ds) == 16
    angles = set(ds.objects_meta["bbox_rot_angle"])
    assert angles == {0, 90, 180, 270}


def test_collate_batches(db):
    ds = make_ds(db)
    batch = collate([ds[0], ds[1]])
    assert batch["image"]["GT"].shape == (2, 128, 128, 3)
    assert batch["lidar"]["cond"]["ref_bbox"].shape == (2, 8, 3)
    assert isinstance(batch["id_name"], list) and len(batch["id_name"]) == 2


def test_erase_box_mixing(db):
    ds = make_ds(db, prob_erase_box=1.0)
    s = ds[0]
    np.testing.assert_allclose(s["image"]["cond"]["ref_bbox"], 0.0)

"""TransFusion training loss + detection pipeline transforms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.transfusion_loss import (
    TransFusionLossConfig,
    draw_heatmap_targets,
    encode_gt_boxes,
    gaussian_focal_loss,
    gaussian_radius,
    hungarian_assign,
    transfusion_loss,
)

CFG = TransFusionLossConfig(num_classes=3, num_proposals=8)


def _fake_preds(rng, B=1, P=8, C=3, H=16, W=16):
    ks = jax.random.split(rng, 7)
    return {
        "heatmap": jax.random.normal(ks[0], (B, P, C)),
        "center": jax.random.uniform(ks[1], (B, P, 2), minval=0, maxval=H),
        "height": jax.random.normal(ks[2], (B, P, 1)),
        "dim": jax.random.normal(ks[3], (B, P, 3)) * 0.1 + 1.0,
        "rot": jax.random.normal(ks[4], (B, P, 2)),
        "vel": jax.random.normal(ks[5], (B, P, 2)) * 0.1,
        "dense_heatmap": jax.random.normal(ks[6], (B, H, W, C)),
    }


def _gt(G=4):
    boxes = np.zeros((G, 9), np.float32)
    boxes[:2] = [
        [5.0, 3.0, -1.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.0],
        [-8.0, -2.0, -0.8, 1.0, 1.0, 1.8, -0.5, 0.0, 0.0],
    ]
    labels = np.zeros((G,), np.int32)
    labels[:2] = [0, 2]
    mask = np.zeros((G,), bool)
    mask[:2] = True
    return jnp.asarray(boxes[None]), jnp.asarray(labels[None]), jnp.asarray(mask[None])


def test_hungarian_assign_simple():
    cost = jnp.asarray(
        [[0.1, 5.0], [5.0, 0.1], [3.0, 3.0], [9.0, 9.0]], jnp.float32
    )
    match = np.asarray(hungarian_assign(cost))
    # proposals 0 and 1 take gts 0/1; scipy leaves the others unmatched
    assert match[0] == 0 and match[1] == 1
    assert (match == -1).sum() == 2


def test_hungarian_device_matches_scipy_optimum():
    """The on-device LAPJV solver must reach scipy's optimal total cost on
    random rectangular problems (assignments may tie-differ), including
    under vmap (the per-batch path in transfusion_loss)."""
    import jax
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(7)
    for _ in range(10):
        P = int(rng.integers(5, 50))
        G = int(rng.integers(1, min(P, 33)))
        cost = rng.normal(size=(P, G)).astype(np.float32)
        m = np.asarray(jax.jit(hungarian_assign)(jnp.asarray(cost)))
        sel = m >= 0
        assert sel.sum() == G and len(set(m[sel])) == G
        dev_total = cost[np.where(sel)[0], m[sel]].sum()
        ref_total = cost[linear_sum_assignment(cost)].sum()
        assert abs(dev_total - ref_total) < 1e-4

    costs = rng.normal(size=(3, 16, 6)).astype(np.float32)
    vm = np.asarray(jax.jit(jax.vmap(hungarian_assign))(jnp.asarray(costs)))
    for b in range(3):
        sel = vm[b] >= 0
        dev_total = costs[b][np.where(sel)[0], vm[b][sel]].sum()
        ref_total = costs[b][linear_sum_assignment(costs[b])].sum()
        assert abs(dev_total - ref_total) < 1e-4


def test_gaussian_radius_monotone():
    small = gaussian_radius(jnp.asarray([2.0, 2.0]), 0.1)
    big = gaussian_radius(jnp.asarray([10.0, 10.0]), 0.1)
    assert float(big) > float(small) > 0


def test_heatmap_targets_peak_at_center():
    boxes, labels, mask = _gt()
    hm = draw_heatmap_targets(boxes[0], labels[0], mask[0], CFG, 180, 180)
    assert hm.shape == (3, 180, 180)
    step = CFG.voxel_size[0] * CFG.out_size_factor
    cx = int((5.0 - CFG.pc_range[0]) / step)
    cy = int((3.0 - CFG.pc_range[1]) / step)
    assert float(hm[0, cy, cx]) == pytest.approx(1.0, abs=1e-5)
    # class 1 has no GT -> empty channel
    assert float(hm[1].max()) == 0.0
    # invalid (masked-out) gts contribute nothing outside the two real peaks
    assert float(hm[2].max()) == pytest.approx(1.0, abs=1e-5)


def test_encode_gt_roundtrips_center():
    boxes, _, _ = _gt()
    code = encode_gt_boxes(boxes, CFG)
    step = CFG.voxel_size[0] * CFG.out_size_factor
    np.testing.assert_allclose(
        code[0, 0, 0], (5.0 - CFG.pc_range[0]) / step, rtol=1e-5
    )
    np.testing.assert_allclose(
        code[0, 0, 2], -1.0 + 1.5 * 0.5, rtol=1e-5
    )  # bottom -> gravity z
    np.testing.assert_allclose(
        code[0, 0, 6] ** 2 + code[0, 0, 7] ** 2, 1.0, rtol=1e-5
    )


def test_gaussian_focal_loss_perfect_pred_near_zero():
    target = jnp.zeros((1, 4, 4))
    target = target.at[0, 2, 2].set(1.0)
    pred = jnp.clip(target, 1e-4, 1 - 1e-4)
    assert float(gaussian_focal_loss(pred, target)) < 1e-2


def test_transfusion_loss_finite_and_grad():
    preds = _fake_preds(jax.random.PRNGKey(0), H=180, W=180)
    boxes, labels, mask = _gt()
    total, metrics = transfusion_loss(preds, boxes, labels, mask, CFG)
    assert np.isfinite(float(total))
    assert int(metrics["num_pos"]) == 2

    def scalar(preds):
        return transfusion_loss(preds, boxes, labels, mask, CFG)[0]

    grads = jax.grad(scalar)(preds)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    # matched proposals must receive bbox gradient signal
    assert float(jnp.abs(grads["center"]).sum()) > 0


def test_transfusion_loss_no_gt():
    preds = _fake_preds(jax.random.PRNGKey(1), H=180, W=180)
    boxes = jnp.zeros((1, 4, 9))
    labels = jnp.zeros((1, 4), jnp.int32)
    mask = jnp.zeros((1, 4), bool)
    total, metrics = transfusion_loss(preds, boxes, labels, mask, CFG)
    assert np.isfinite(float(total))
    assert float(metrics["loss_bbox"]) == 0.0


def test_pipeline_global_rot_scale_trans_consistency():
    from mobi_tpu.data.det_pipeline import global_rot_scale_trans

    rng = np.random.default_rng(0)
    # a point at a box center must stay at the box center
    boxes = np.array([[4.0, -2.0, 0.0, 2.0, 1.0, 1.0, 0.3, 1.0, 0.5]],
                     np.float32)
    points = np.array([[4.0, -2.0, 0.0, 0.5, 0.0]], np.float32)
    p2, b2, M = global_rot_scale_trans(points, boxes, rng)
    np.testing.assert_allclose(p2[0, :3], b2[0, :3], atol=1e-5)
    # the returned matrix reproduces the applied point transform
    np.testing.assert_allclose(
        (M @ np.append(points[0, :3], 1.0))[:3], p2[0, :3], atol=1e-5
    )


def test_pipeline_flip_and_filters():
    from mobi_tpu.data.det_pipeline import (
        object_name_filter,
        object_range_filter,
        points_range_filter,
        random_flip_3d,
    )

    rng = np.random.default_rng(1)
    boxes = np.array([[1.0, 2.0, 0.0, 2.0, 1.0, 1.0, 0.5]], np.float32)
    points = np.array([[1.0, 2.0, 0.0]], np.float32)
    p2, b2, M = random_flip_3d(points, boxes, rng, 1.0, 0.0)  # force h-flip
    assert p2[0, 1] == -2.0 and b2[0, 1] == -2.0 and b2[0, 6] == -0.5
    assert M[1, 1] == -1.0 and M[0, 0] == 1.0

    pc = [-5.0, -5.0, -5.0, 5.0, 5.0, 5.0]
    boxes = np.array(
        [[0.0, 0.0, 0.0, 1, 1, 1, 0], [9.0, 0.0, 0.0, 1, 1, 1, 0]], np.float32
    )
    labels = np.array([0, 1])
    b3, l3 = object_range_filter(boxes, labels, pc)
    assert len(b3) == 1 and l3[0] == 0

    pts = np.array([[0, 0, 0], [9, 9, 9]], np.float32)
    assert len(points_range_filter(pts, pc)) == 1

    boxes, labels = object_name_filter(
        np.zeros((2, 7), np.float32), ["car", "rock"], ["car", "bus"]
    )
    assert len(boxes) == 1 and labels[0] == 0


def test_gt_database_sampler(tmp_path):
    import pickle

    from mobi_tpu.data.det_pipeline import GTDatabaseSampler

    # database with one car object at origin
    obj_pts = np.array([[0.2, 0.1, 0.3, 1.0, 0.0]], np.float32)
    np.save(tmp_path / "obj.npy", obj_pts)
    infos = {"car": [{"path": "obj.npy",
                      "box": [10.0, 10.0, 0.0, 4.0, 2.0, 1.5, 0.0],
                      "num_points": 1}]}
    with open(tmp_path / "gt_db_infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    sampler = GTDatabaseSampler(
        str(tmp_path / "gt_db_infos.pkl"), sample_groups={"car": 1}
    )
    points = np.zeros((5, 5), np.float32)
    boxes = np.zeros((0, 7), np.float32)
    labels = np.zeros((0,), np.int64)
    p2, b2, l2 = sampler(points, boxes, labels, ["car"])
    assert len(b2) == 1 and l2[0] == 0
    # pasted object points moved to the sampled box center
    assert len(p2) == 6
    np.testing.assert_allclose(p2[-1, :3], [10.2, 10.1, 0.3], atol=1e-5)

    # a colliding scene box blocks the paste
    boxes = np.array([[10.0, 10.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    labels = np.array([0])
    sampler2 = GTDatabaseSampler(
        str(tmp_path / "gt_db_infos.pkl"), sample_groups={"car": 2}
    )
    p3, b3, l3 = sampler2(points, boxes, labels, ["car"])
    assert len(b3) == 1  # no room


def test_multisweep_loading(tmp_path):
    from mobi_tpu.data.det_pipeline import load_points_multisweep

    key_pts = np.array([[5.0, 0.0, 0.0, 1.0, 9.9]], np.float32)
    sweep_pts = np.array([[2.0, 0.0, 0.0, 1.0, 9.9]], np.float32)
    key_pts.tofile(tmp_path / "key.bin")
    sweep_pts.tofile(tmp_path / "sweep.bin")
    T = np.eye(4)
    T[0, 3] = 1.0  # sweep frame shifted 1m
    rec = {
        "lidar_path": str(tmp_path / "key.bin"),
        "sweeps": [
            {"data_path": str(tmp_path / "sweep.bin"), "sweep2lidar": T,
             "time_lag": 0.05}
        ],
    }
    pts = load_points_multisweep(rec, sweeps_num=1)
    assert pts.shape == (2, 5)
    np.testing.assert_allclose(pts[0, 4], 0.0)  # keyframe lag 0
    np.testing.assert_allclose(pts[1, 0], 3.0, atol=1e-5)  # transformed
    np.testing.assert_allclose(pts[1, 4], 0.05, atol=1e-6)


def test_grid_mask_zeroes_bands():
    from mobi_tpu.data.det_pipeline import grid_mask

    rng = np.random.default_rng(0)
    imgs = np.ones((2, 32, 48, 3), np.float32)
    out = grid_mask(imgs, rng, prob=1.0, max_rotate=1)
    assert out.shape == imgs.shape
    assert out.min() == 0.0 and out.max() == 1.0
    # same mask across views
    np.testing.assert_allclose(out[0, ..., 0], out[1, ..., 0])


def test_object_noise_moves_box_and_points():
    from mobi_tpu.data.det_pipeline import object_noise

    rng = np.random.default_rng(3)
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    points = np.array([[0.1, 0.1, 0.5, 1.0, 0.0]], np.float32)
    p2, b2 = object_noise(points, boxes, rng)
    # box moved; its interior point moved with it (same relative offset up
    # to the rotation)
    assert not np.allclose(b2[0, :3], boxes[0, :3])
    rel_orig = np.linalg.norm(points[0, :2] - boxes[0, :2])
    rel_new = np.linalg.norm(p2[0, :2] - b2[0, :2])
    np.testing.assert_allclose(rel_new, rel_orig, atol=1e-5)


def test_frame_dropout_keeps_keyframe():
    from mobi_tpu.data.det_pipeline import frame_dropout

    rng = np.random.default_rng(0)
    pts = np.array(
        [[0, 0, 0, 0, 0.0], [1, 0, 0, 0, 0.05], [2, 0, 0, 0, 0.1]],
        np.float32,
    )
    out = frame_dropout(pts, rng, prob=1.0)  # drop every sweep
    np.testing.assert_allclose(out[:, 4], 0.0)
    assert len(out) == 1


def test_point_sample_fixed_count():
    from mobi_tpu.data.det_pipeline import point_sample

    rng = np.random.default_rng(0)
    pts = np.random.default_rng(1).normal(size=(10, 5)).astype(np.float32)
    assert point_sample(pts, 4, rng).shape == (4, 5)
    assert point_sample(pts, 20, rng).shape == (20, 5)  # pad via replacement


def test_background_points_filter():
    from mobi_tpu.data.det_pipeline import background_points_filter

    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    pts = np.array(
        [
            [0.0, 0.0, 1.0],     # inside the box -> kept
            [1.15, 0.0, 1.0],    # in the enlarged shell -> dropped
            [5.0, 5.0, 1.0],     # far background -> kept
        ],
        np.float32,
    )
    out = background_points_filter(pts, boxes, bbox_enlarge_range=0.4)
    assert len(out) == 2
    assert not any(np.allclose(r, pts[1]) for r in out)


def test_image_aug_3d_shapes_and_matrix():
    from mobi_tpu.data.det_pipeline import image_aug_3d

    imgs = np.random.default_rng(0).normal(
        size=(2, 90, 160, 3)
    ).astype(np.float32)
    out, mats = image_aug_3d(
        imgs, None, final_dim=(32, 64), resize_lim=(0.45, 0.45),
        is_train=False,
    )
    assert out.shape == (2, 32, 64, 3)
    assert mats.shape == (2, 4, 4)
    # eval mode: pure resize+crop -> diagonal scale, no rotation
    np.testing.assert_allclose(mats[0, 0, 0], 0.45, atol=1e-6)
    np.testing.assert_allclose(mats[0, 0, 1], 0.0, atol=1e-6)


def test_multisweep_keyframe_unfiltered(tmp_path):
    """The keyframe cloud keeps near-ego points; _remove_close applies only
    to previous sweeps (reference loading.py:184-193, 218-219)."""
    from mobi_tpu.data.det_pipeline import load_points_multisweep

    key_pts = np.array(
        [[0.5, 0.0, 0.0, 1.0, 0.0], [5.0, 0.0, 0.0, 1.0, 0.0]], np.float32
    )
    sweep_pts = np.array(
        [[0.5, 0.0, 0.0, 1.0, 0.0], [6.0, 0.0, 0.0, 1.0, 0.0]], np.float32
    )
    key_pts.tofile(tmp_path / "key.bin")
    sweep_pts.tofile(tmp_path / "sweep.bin")
    rec = {
        "lidar_path": str(tmp_path / "key.bin"),
        "sweeps": [
            {"data_path": str(tmp_path / "sweep.bin"),
             "sweep2lidar": np.eye(4), "time_lag": 0.05}
        ],
    }
    pts = load_points_multisweep(rec, sweeps_num=1)
    # 2 keyframe points (near-ego KEPT) + 1 sweep point (near-ego dropped)
    assert pts.shape == (3, 5)
    key_rows = pts[pts[:, 4] == 0.0]
    assert len(key_rows) == 2 and np.any(np.abs(key_rows[:, 0]) < 1.0)
    # padded empty-sweep copies DO get filtered
    rec2 = {"lidar_path": str(tmp_path / "key.bin"), "sweeps": []}
    pts2 = load_points_multisweep(rec2, sweeps_num=2)
    assert len(pts2) == 2 + 2 * 1  # full keyframe + 2 filtered copies


def test_image_aug_3d_negative_crop_matches_matrix(tmp_path):
    """When the resized image is shorter than the final height (negative
    crop_h), the pixels must sit where img_aug_matrix says they do (PIL
    pads with black at the top)."""
    from mobi_tpu.data.det_pipeline import image_aug_3d

    imgs = np.ones((1, 90, 160, 3), np.float32)
    out, mats = image_aug_3d(
        imgs, None, final_dim=(32, 64), resize_lim=(0.3, 0.3),
        is_train=False,
    )
    # newH = 27, crop_h = 27 - 32 = -5 -> translation +5 in the matrix
    ty = mats[0, 1, 3]
    assert ty == pytest.approx(5.0)
    # rows [0, ty) are black padding; content starts exactly at row ty
    assert np.all(out[0, :5] == 0.0)
    assert np.all(out[0, 5:27 + 5].max(axis=(1, 2)) > 0.0)


def test_train_pipeline_emits_velocity_targets(tmp_path):
    """train_pipeline appends lidar-frame gt velocities (nan -> 0) as box
    columns 7:9 (reference nuscenes_dataset.py:352-356)."""
    from mobi_tpu.data.det_pipeline import train_pipeline

    pts = np.zeros((64, 5), np.float32)
    pts[:, 0] = np.linspace(1.5, 50.0, 64)
    pts.tofile(tmp_path / "key.bin")
    rec = {
        "lidar_path": str(tmp_path / "key.bin"),
        "sweeps": [],
        "gt_bboxes_3d": np.array(
            [[10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
             [20.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32
        ),
        "gt_velocity": np.array(
            [[3.0, -1.0], [np.nan, np.nan]], np.float32
        ),
        "gt_names": ["car", "car"],
    }
    rng = np.random.default_rng(0)
    out = train_pipeline(
        rec, classes=["car"], rng=rng, sweeps_num=0,
    )
    boxes = out["gt_bboxes_3d"]
    assert boxes.shape[1] == 9
    # velocities transform with the scene augmentation like BEV vectors do:
    # finite for the first box, exactly zero for the nan-filled one
    vel_norms = np.linalg.norm(boxes[:, 7:9], axis=1)
    assert np.all(np.isfinite(boxes))
    if len(boxes) == 2:  # both survived the range filter
        assert vel_norms.max() > 0.0 and vel_norms.min() == 0.0


def test_detection_dataset_multisweep(tmp_path):
    """sweeps_num>0 wires load_points_multisweep into the eval loader:
    aggregated clouds are [N, 5] with a time-lag 5th channel (0 for the
    keyframe, >0 for previous sweeps) and the keyframe excluded from the
    sweep list (reference loading.py:84-238)."""
    from mobi_tpu.data.detection_dataset import DetectionSceneDataset
    from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw

    root = str(tmp_path / "nusc")
    build_synthetic_nuscenes_raw(root, num_scenes=1, samples_per_scene=2)

    key_ds = DetectionSceneDataset(root, load_images=False)
    ms_ds = DetectionSceneDataset(root, load_images=False, sweeps_num=2)
    ex_key = key_ds[0]
    ex_ms = ms_ds[0]
    assert ex_key["points"].shape[1] == 4  # keyframe-only path unchanged
    assert ex_ms["points"].shape[1] == 5
    lags = ex_ms["points"][:, 4]
    # keyframe points (lag 0) plus two sweeps at ~50ms and ~100ms
    assert (lags == 0).sum() == len(ex_key["points"])
    sweep_lags = sorted(set(np.round(lags[lags > 0], 3)))
    assert sweep_lags == [0.05, 0.1]
    # each synthetic sweep holds 300 points, near-ego ones filtered
    assert ((lags > 0).sum()) <= 600
    assert (lags > 0).sum() > 500


def test_camera_batch_inputs_geometry():
    """camera_batch_inputs: the depth map is built from the UN-augmented
    cloud and cam2lidar carries the composed lidar aug (host-side
    equivalent of the reference's lidar_aug_matrix plumbing,
    vtransforms/base.py:241-258)."""
    from mobi_tpu.models.bevfusion import build_sparse_depth_map
    from mobi_tpu.models.detector_training import camera_batch_inputs

    rng = np.random.default_rng(3)
    pts0 = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    ang = 0.4
    c, s = np.cos(ang), np.sin(ang)
    aug = np.eye(4, dtype=np.float32)
    aug[:2, :2] = 1.05 * np.array([[c, -s], [s, c]])
    aug[2, 2] = 1.05
    aug[:3, 3] = [0.2, -0.1, 0.05]
    pts_aug = pts0 @ aug[:3, :3].T + aug[:3, 3]
    pts_aug = np.concatenate(
        [pts_aug, np.zeros((len(pts_aug), 2), np.float32)], 1
    )

    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K4[1, 1] = 60.0
    K4[0, 2], K4[1, 2] = 16.0, 8.0
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    sample = dict(
        images=np.zeros((1, 16, 32, 3), np.float32),
        lidar2image=(K4 @ T)[None],
        camera2lidar=np.linalg.inv(T)[None],
        camera_intrinsics=K4[None],
    )
    out = camera_batch_inputs(pts_aug, aug, sample)

    want = build_sparse_depth_map(pts0, sample["lidar2image"], (16, 32))
    np.testing.assert_allclose(out["depth_map"], want, atol=1e-4)
    # cam origin lands at aug @ (camera position in lidar frame)
    origin = out["cam2lidar"][0] @ np.array([0, 0, 0, 1.0])
    want_origin = aug @ sample["camera2lidar"][0] @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(origin, want_origin, atol=1e-5)
    assert out["intrins"].shape == (1, 3, 3)


def test_camera_batch_inputs_random_image_aug_folds():
    """With image_aug on, each view's random affine folds into lidar2image:
    a projected point's new pixel position equals affine(old position)."""
    from mobi_tpu.models.detector_training import camera_batch_inputs

    rng = np.random.default_rng(9)
    pts = np.concatenate(
        [rng.uniform(2, 8, (50, 3)).astype(np.float32),
         np.zeros((50, 2), np.float32)], 1,
    )
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K4[1, 1] = 40.0
    K4[0, 2], K4[1, 2] = 16.0, 8.0
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    sample = dict(
        images=rng.normal(size=(1, 16, 32, 3)).astype(np.float32),
        lidar2image=(K4 @ T)[None],
        camera2lidar=np.linalg.inv(T)[None],
        camera_intrinsics=K4[None],
    )
    out = camera_batch_inputs(
        pts, np.eye(4, dtype=np.float32), sample,
        rng=np.random.default_rng(5), image_aug=True,
    )
    assert out["images"].shape == (1, 16, 32, 3)
    # reconstruct the applied affine from the folded intrinsics: it must
    # be a pure 2D affine (last row (0, 0, 1)) and the depth map finite
    A = out["intrins"][0] @ np.linalg.inv(K4[:3, :3])
    np.testing.assert_allclose(A[2], [0, 0, 1], atol=1e-6)
    assert np.isfinite(out["depth_map"]).all()


def test_rot_to_quat_stable_near_180deg():
    """Shepperd extraction vs scipy for rotations including yaw ~ pi,
    where the trace-only formula degenerates."""
    from scipy.spatial.transform import Rotation

    from mobi_tpu.detector_inference import _rot_to_quat

    rng = np.random.default_rng(2)
    mats = [Rotation.random(random_state=3).as_matrix() for _ in range(5)]
    mats += [Rotation.from_euler("z", np.pi - 1e-9).as_matrix(),
             Rotation.from_euler("z", np.pi).as_matrix(),
             Rotation.from_euler("xyz", [np.pi, 0, 1e-8]).as_matrix()]
    for R in mats:
        w, x, y, z = _rot_to_quat(np.asarray(R))
        want = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
        got = np.array([x, y, z, w])
        # quaternions are sign-ambiguous
        err = min(np.abs(got - want).max(), np.abs(got + want).max())
        assert err < 1e-7, (R, got, want)


def test_hungarian_assign_rejects_more_gt_than_proposals():
    from mobi_tpu.models.transfusion_loss import hungarian_assign

    with pytest.raises(ValueError, match="proposals >= gt"):
        hungarian_assign(jnp.zeros((4, 6)))

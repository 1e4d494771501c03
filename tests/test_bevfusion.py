"""BEVFusion lidar branch: sparse-encoder plan invariants, end-to-end shapes
through voxelize -> VFE -> sparse encoder -> SECOND -> FPN, fuser."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu import native
from mobi_tpu.models.bevfusion import (
    ConvFuser,
    LidarBEVNetwork,
    SECONDBackbone,
    SECONDFPN,
    SparseEncoderTPU,
    hard_simple_vfe,
    plan_sparse_encoder,
)

SPARSE_SHAPE = (64, 64, 41)  # tiny x/y, the reference z-depth 41


@pytest.fixture(scope="module")
def sparse_input():
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [
            rng.uniform(0, 9.6, (3000, 2)),       # x, y in range
            rng.uniform(-3, 1.1, (3000, 1)),      # z
            rng.uniform(0, 1, (3000, 2)),         # intensity, dt
        ],
        axis=1,
    ).astype(np.float32)
    voxels, coords, npv = native.hard_voxelize(
        pts, (0.15, 0.15, 0.1), (0, 0, -3, 9.6, 9.6, 1.1),
        max_points=10, max_voxels=4000,
    )
    feats = hard_simple_vfe(jnp.asarray(voxels), jnp.asarray(npv))
    return np.asarray(feats), coords


def test_vfe_mean():
    voxels = jnp.asarray([[[2.0, 4.0], [4.0, 0.0], [0.0, 0.0]]])
    out = hard_simple_vfe(voxels, jnp.asarray([2]))
    np.testing.assert_allclose(np.asarray(out), [[3.0, 2.0]])


def test_plan_z_depth_ladder(sparse_input):
    """z extent follows the reference conv arithmetic:
    41 ->(k3 s2 p1) 21 -> 11 ->(p0) 5 ->(k3 s2 conv_out) 2."""
    _, coords = sparse_input
    plans, out_coords, out_shape = plan_sparse_encoder(coords, SPARSE_SHAPE)
    assert out_shape[2] == 2
    assert set(plans) >= {"subm0", "down0", "subm1", "down1", "subm2",
                          "down2", "subm3", "out"}
    # submanifold stages preserve site count
    assert plans["subm0"].n_out == len(coords)
    assert plans["subm1"].n_out == plans["down0"].n_out
    # a regular (non-submanifold) sparse conv DILATES the active set but
    # stays within the conv-arithmetic output bounds
    assert plans["down0"].n_out <= min(len(coords) * 27, 32 * 32 * 21)
    for d, bound in enumerate((32, 32, 21)):
        assert plans["down0"].out_coords[:, d].max() < bound
    assert out_coords.max(axis=0)[2] <= 1


def test_sparse_encoder_bev_shape(sparse_input):
    feats, coords = sparse_input
    plans, out_coords, out_shape = plan_sparse_encoder(coords, SPARSE_SHAPE)
    enc = SparseEncoderTPU()
    params = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), plans, out_coords, out_shape
    )
    bev = enc.apply(params, jnp.asarray(feats), plans, out_coords, out_shape)
    assert bev.shape == (1, out_shape[0], out_shape[1], 2 * 128)
    assert np.all(np.isfinite(np.asarray(bev)))
    assert float(jnp.abs(bev).sum()) > 0


def test_second_and_fpn_shapes():
    x = jnp.ones((1, 32, 32, 256))
    backbone = SECONDBackbone()
    p = backbone.init(jax.random.PRNGKey(0), x)
    outs = backbone.apply(p, x)
    assert outs[0].shape == (1, 32, 32, 128)
    assert outs[1].shape == (1, 16, 16, 256)

    neck = SECONDFPN()
    pn = neck.init(jax.random.PRNGKey(1), outs)
    fused = neck.apply(pn, outs)
    assert fused.shape == (1, 32, 32, 512)


def test_conv_fuser():
    cam = jnp.ones((1, 16, 16, 80))
    lid = jnp.ones((1, 16, 16, 256))
    fuser = ConvFuser(out_channels=256)
    p = fuser.init(jax.random.PRNGKey(0), [cam, lid])
    out = fuser.apply(p, [cam, lid])
    assert out.shape == (1, 16, 16, 256)


def test_depth_lss_transform():
    from mobi_tpu.models.bevfusion import (
        DepthLSSTransformTPU,
        build_sparse_depth_map,
    )

    # tiny geometry: 2 cameras, 64x176 images, 8x22 features, coarse BEV
    vt = DepthLSSTransformTPU(
        in_channels=32, out_channels=16, image_size=(64, 176),
        feature_size=(8, 22), xbound=(-10, 10, 0.5), ybound=(-10, 10, 0.5),
        zbound=(-10, 10, 20.0), dbound=(1.0, 9.0, 1.0), downsample=2,
    )
    rng = np.random.default_rng(0)
    pts = rng.uniform(-8, 8, (500, 3)).astype(np.float32)
    K = np.array([[100.0, 0, 88], [0, 100.0, 32], [0, 0, 1]])
    l2i = []
    c2l = []
    for yaw in (0.0, np.pi / 2):
        c, s = np.cos(yaw), np.sin(yaw)
        # lidar->cam rows = camera (right, down, forward) axes in lidar frame
        fwd = np.array([c, s, 0.0])
        right = np.array([s, -c, 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R_lc = np.stack([right, down, fwd])          # lidar -> cam
        T = np.eye(4)
        T[:3, :3] = R_lc
        K4 = np.eye(4)
        K4[:3, :3] = K
        l2i.append(K4 @ T)
        C = np.eye(4)
        C[:3, :3] = R_lc.T                            # cam -> lidar
        c2l.append(C)
    depth_map = build_sparse_depth_map(pts, np.stack(l2i), (64, 176))
    assert depth_map.shape == (2, 64, 176, 1)
    assert depth_map.max() > 0  # some points landed in frame

    feats = jnp.asarray(rng.normal(size=(2, 8, 22, 32)).astype(np.float32))
    params = vt.init(
        jax.random.PRNGKey(0), feats, jnp.asarray(depth_map),
        jnp.asarray(np.stack(c2l), jnp.float32),
        jnp.asarray(np.stack([K, K]), jnp.float32),
    )
    bev = vt.apply(
        params, feats, jnp.asarray(depth_map),
        jnp.asarray(np.stack(c2l), jnp.float32),
        jnp.asarray(np.stack([K, K]), jnp.float32),
    )
    # 40x40 grid downsampled by 2 -> 20x20, out 16ch
    assert bev.shape == (1, 20, 20, 16)
    assert np.all(np.isfinite(np.asarray(bev)))
    assert float(jnp.abs(bev).sum()) > 0


def test_transfusion_head_forward_and_decode():
    from mobi_tpu.models.bevfusion import TransFusionHeadTPU

    head = TransFusionHeadTPU(num_proposals=32)
    bev = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 512)) * 0.1
    params = head.init(jax.random.PRNGKey(1), bev)
    preds = head.apply(params, bev)
    assert preds["center"].shape == (1, 32, 2)
    assert preds["heatmap"].shape == (1, 32, 10)
    assert preds["dense_heatmap"].shape == (1, 32, 32, 10)

    out = head.apply(params, preds, method=head.decode_boxes)
    assert out["bboxes"].shape == (1, 32, 9)
    assert out["scores"].shape == (1, 32)
    assert out["labels"].shape == (1, 32)
    assert np.all(np.isfinite(np.asarray(out["bboxes"])))
    assert np.asarray(out["scores"]).min() >= 0
    # boxes decode into the point-cloud range scale
    assert np.abs(np.asarray(out["bboxes"][..., :2])).max() <= 61.3

    # top-k proposals pick heatmap peaks: plant a strong peak, expect its
    # cell among the selected positions
    bev_peak = bev.at[0, 16, 20, :].add(20.0)
    preds2 = head.apply(params, bev_peak)
    # peak cell index = y*W + x in the flattened grid
    centers = np.asarray(preds2["center"][0])
    assert np.any(
        (np.abs(centers[:, 0] - 20.5) < 2) & (np.abs(centers[:, 1] - 16.5) < 2)
    )


def test_transfusion_head_jit():
    from mobi_tpu.models.bevfusion import TransFusionHeadTPU

    head = TransFusionHeadTPU(num_proposals=16)
    bev = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 512)) * 0.1
    params = head.init(jax.random.PRNGKey(3), bev)

    @jax.jit
    def run(p, x):
        preds = head.apply(p, x)
        return head.apply(p, preds, method=head.decode_boxes)

    out = run(params, bev)
    assert out["bboxes"].shape == (2, 16, 9)
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_bevfusion_detector_lidar_only():
    """Full detector composition, lidar-only config, tiny grid: points ->
    prepare_lidar_inputs -> encoder -> SECOND/FPN -> head -> decoded boxes."""
    from mobi_tpu.models.bevfusion import BEVFusionDetector, prepare_lidar_inputs

    rng = np.random.default_rng(7)
    pts = np.concatenate(
        [rng.uniform(-4.8, 4.8, (2000, 2)), rng.uniform(-4.9, 2.9, (2000, 1)),
         rng.uniform(0, 1, (2000, 2))], axis=1,
    ).astype(np.float32)
    feats, plans, out_coords, out_shape = prepare_lidar_inputs(
        pts, voxel_size=(0.15, 0.15, 0.2), pc_range=(-4.8, -4.8, -5, 4.8, 4.8, 3.2),
        max_voxels=8000,
    )
    det = BEVFusionDetector(use_camera=False, num_proposals=16)
    params = det.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), plans, out_coords, out_shape
    )
    preds = det.apply(
        params, jnp.asarray(feats), plans, out_coords, out_shape
    )
    out = det.apply(params, preds, method=det.decode)
    assert out["bboxes"].shape == (1, 16, 9)
    assert np.all(np.isfinite(np.asarray(out["bboxes"])))
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_lidar_bev_network_end_to_end(sparse_input):
    feats, coords = sparse_input
    plans, out_coords, out_shape = plan_sparse_encoder(coords, SPARSE_SHAPE)
    net = LidarBEVNetwork()
    params = net.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), plans, out_coords, out_shape
    )
    out = net.apply(params, jnp.asarray(feats), plans, out_coords, out_shape)
    # BEV X/Y preserved by SECOND stage0 (stride 1) + FPN upsample of stage1
    assert out.shape == (1, out_shape[0], out_shape[1], 512)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bevfusion_detector_camera_lidar_fused():
    """Full camera+lidar fused detector, tiny geometry: 2 views through
    Swin-T -> GeneralizedLSSFPN -> DepthLSS (lidar-guided), sparse lidar
    branch, ConvFuser, SECOND/FPN, TransFusion head + decode — the
    composition of reference fusion_models/bevfusion.py:207-310 in one
    forward."""
    from mobi_tpu.models.bevfusion import (
        BEVFusionDetector,
        build_sparse_depth_map,
        prepare_lidar_inputs,
    )

    rng = np.random.default_rng(7)
    pts = np.concatenate(
        [rng.uniform(-4.8, 4.8, (2000, 2)), rng.uniform(-4.9, 2.9, (2000, 1)),
         rng.uniform(0, 1, (2000, 2))], axis=1,
    ).astype(np.float32)
    feats, plans, out_coords, out_shape = prepare_lidar_inputs(
        pts, voxel_size=(0.15, 0.15, 0.2),
        pc_range=(-4.8, -4.8, -5, 4.8, 4.8, 3.2), max_voxels=8000,
    )

    # 2 cameras, 64x176 images (stride-8 features: 8x22)
    iH, iW = 64, 176
    K = np.array([[100.0, 0, 88], [0, 100.0, 32], [0, 0, 1]])
    l2i, c2l = [], []
    for yaw in (0.0, np.pi / 2):
        c, s = np.cos(yaw), np.sin(yaw)
        fwd = np.array([c, s, 0.0])
        right = np.array([s, -c, 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R_lc = np.stack([right, down, fwd])
        T = np.eye(4)
        T[:3, :3] = R_lc
        K4 = np.eye(4)
        K4[:3, :3] = K
        l2i.append(K4 @ T)
        C = np.eye(4)
        C[:3, :3] = R_lc.T
        c2l.append(C)
    images = rng.normal(size=(2, iH, iW, 3)).astype(np.float32)
    depth_map = build_sparse_depth_map(pts[:, :3], np.stack(l2i), (iH, iW))

    det = BEVFusionDetector(
        use_camera=True, num_proposals=16,
        lss_kwargs=dict(
            image_size=(iH, iW), feature_size=(iH // 8, iW // 8),
            xbound=(-4.8, 4.8, 0.3), ybound=(-4.8, 4.8, 0.3),
            zbound=(-5.0, 3.2, 8.2), dbound=(1.0, 9.0, 1.0),
        ),
        head_kwargs=dict(voxel_size=(0.15, 0.15), pc_range=(-4.8, -4.8)),
    )
    kwargs = dict(
        images=jnp.asarray(images), depth_map=jnp.asarray(depth_map),
        cam2lidar=jnp.asarray(np.stack(c2l), jnp.float32),
        intrins=jnp.asarray(np.stack([K, K]), jnp.float32),
    )
    params = det.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), plans, out_coords,
        out_shape, **kwargs,
    )
    preds = det.apply(
        params, jnp.asarray(feats), plans, out_coords, out_shape, **kwargs
    )
    out = det.apply(params, preds, method=det.decode)
    assert out["bboxes"].shape == (1, 16, 9)
    for k in ("bboxes", "scores", "labels"):
        assert np.all(np.isfinite(np.asarray(out[k], np.float32))), k

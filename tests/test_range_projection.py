"""LidarConverter-equivalent: projection round-trips and view transforms."""
import numpy as np
import pytest

from mobi_tpu.data.range_projection import (
    DEPTH_MAX,
    DEPTH_MIN,
    RANGE_H,
    RANGE_W,
    RangeCropGeom,
    apply_range_transforms,
    bbox_range_coords,
    block_mean_resize,
    default_width_crop,
    denormalize_depth,
    normalize_depth,
    pcd_to_range,
    range_to_pcd,
    resize_range,
    undo_range_transforms,
)


def synthetic_cloud(n=5000, seed=0):
    """Points on the 32 beam rays so projection is exactly invertible."""
    rng = np.random.default_rng(seed)
    from mobi_tpu.data.range_projection import BEAM_PITCH

    pitch = rng.choice(BEAM_PITCH, n)
    yaw = rng.uniform(-np.pi * 0.999, np.pi * 0.999, n)
    depth = rng.uniform(DEPTH_MIN + 0.5, DEPTH_MAX - 1.0, n)
    x = np.cos(yaw) * np.cos(pitch) * depth
    y = -np.sin(yaw) * np.cos(pitch) * depth
    z = np.sin(pitch) * depth
    return np.stack([x, y, z], 1), depth


def test_depth_norm_roundtrip():
    d = np.linspace(0, DEPTH_MAX, 100)
    np.testing.assert_allclose(denormalize_depth(normalize_depth(d)), d, atol=1e-6)


def test_pcd_to_range_shapes_and_ranges():
    pts, _ = synthetic_cloud()
    depth_n, inten, valid, pitch, yaw = pcd_to_range(pts, np.ones(len(pts)))
    assert depth_n.shape == (RANGE_H, RANGE_W)
    assert inten.shape == (RANGE_H, RANGE_W)
    assert valid.all()
    assert depth_n.min() >= -1 and depth_n.max() <= 1
    # empty pixels carry depth 0m -> normalized -1
    assert (depth_n == -1).any()


def test_projection_roundtrip_recovers_points():
    pts, depth = synthetic_cloud(2000)
    depth_n, _, valid, pitch, yaw = pcd_to_range(pts)
    rec, _, beams = range_to_pcd(depth_n, pitch, yaw)
    # every reconstructed point must be (close to) a real input point:
    # match by nearest neighbor
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    dist, _ = tree.query(rec, k=1)
    # z-buffering keeps the nearest point per pixel; depth quantization from
    # the [-1,1] float32 normalization is ~DEPTH_MAX/2 * 1e-7 — dominant error
    # is the pixel's angular center vs the point's true angle, bounded here by
    # matching beams exactly, so only yaw binning remains.
    assert np.median(dist) < 0.05
    assert beams.min() >= 0 and beams.max() <= 31


def test_bbox_range_coords_contiguous_across_seam():
    """A box behind the sensor (wrap seam) must stay contiguous thanks to
    the center-yaw unwrap (lidar_converter.py:195-204)."""
    # box straddling the -x axis (yaw = pi seam)
    base = np.array(
        [[-10, 0.5, -1], [-10, -0.5, -1], [-11, -0.5, -1], [-11, 0.5, -1],
         [-10, 0.5, 1], [-10, -0.5, 1], [-11, -0.5, 1], [-11, 0.5, 1]],
        dtype=np.float64,
    )
    coords = bbox_range_coords(base)
    span = coords[:, 0].max() - coords[:, 0].min()
    assert span < RANGE_W / 4, f"box wrapped around the seam: span {span}"


def test_default_width_crop_pow2():
    coords = np.zeros((8, 3), np.float32)
    coords[:, 0] = np.linspace(100, 140, 8)  # width 40 -> 1.5x = 60 -> 64
    assert default_width_crop(coords, 512) == 64
    coords[:, 0] = np.linspace(100, 200, 8)  # 150 -> 256
    assert default_width_crop(coords, 512) == 256
    coords[:, 0] = np.linspace(0, 3000, 8)
    assert default_width_crop(coords, 512) == 512


def test_apply_and_undo_transforms_roundtrip():
    rng = np.random.default_rng(3)
    depth = rng.uniform(-1, 1, (RANGE_H, RANGE_W)).astype(np.float32)
    inten = rng.uniform(-1, 1, (RANGE_H, RANGE_W)).astype(np.float32)
    # an object around azimuth column 500
    coords = np.zeros((8, 3), np.float32)
    coords[:, 0] = np.linspace(490, 520, 8)
    coords[:, 1] = np.linspace(10, 20, 8)

    d_c, i_c, _, coords_t, geom = apply_range_transforms(
        coords, depth, inten, out_h=512, out_w=512
    )
    assert d_c.shape == (512, 512)
    assert geom.width_crop in (64, 128, 256, 512)
    # transformed coords are inside the crop
    assert coords_t[:, 0].min() >= 0 and coords_t[:, 0].max() <= 512

    # paste back without a mask: the crop region must reproduce the original
    d_out, i_out = undo_range_transforms(geom, d_c, depth, i_c, inten)
    lo = geom.crop_left % RANGE_W
    hi = min(lo + geom.width_crop, RANGE_W)
    np.testing.assert_allclose(d_out[:, lo:hi], depth[:, lo:hi], atol=1e-5)
    np.testing.assert_allclose(i_out[:, lo:hi], inten[:, lo:hi], atol=1e-5)
    # outside the crop: untouched
    outside = np.ones(RANGE_W, bool)
    outside[lo:hi] = False
    wrap = geom.width_crop - (hi - lo)
    if wrap > 0:
        outside[:wrap] = False
    np.testing.assert_array_equal(d_out[:, outside], depth[:, outside])


def test_block_mean_resize_matches_manual():
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = block_mean_resize(x, 2, 2)
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_resize_range_uses_pool_when_divisible():
    x = np.random.default_rng(0).uniform(size=(64, 64)).astype(np.float32)
    out = resize_range(x, 32, 32, "avg")
    np.testing.assert_allclose(out, block_mean_resize(x, 32, 32), atol=1e-6)
    out_max = resize_range(x, 32, 32, "max")
    assert (out_max >= out - 1e-6).all()

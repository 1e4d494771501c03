"""C++ host ops vs their pure-numpy oracles (mobi_tpu/native).

Covers the reference native-op families of bevfusion/mmdet3d/ops/: voxel,
knn, ball_query, furthest_point_sample, interpolate (three_nn),
roiaware_pool3d (points_in_boxes)."""
import numpy as np
import pytest

from mobi_tpu import native

NATIVE = native.native_available()


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return rng.uniform(-40, 40, (2000, 4)).astype(np.float32)


def test_native_library_builds():
    assert NATIVE, "g++ build of native/mobi_native.cpp failed"


VS = (0.5, 0.5, 0.5)
CR = (-40, -40, -40, 40, 40, 40)


def test_dynamic_voxelize_matches_numpy(cloud):
    a = native.dynamic_voxelize(cloud, VS, CR)
    b = native.dynamic_voxelize(cloud, VS, CR, force_numpy=True)
    np.testing.assert_array_equal(a, b)
    # out-of-range -> -1
    pts = np.array([[100.0, 0, 0, 0], [0, 0, 0, 0]], np.float32)
    c = native.dynamic_voxelize(pts, VS, CR)
    assert (c[0] == -1).all() and (c[1] >= 0).all()


def test_hard_voxelize_matches_numpy(cloud):
    va, ca, na = native.hard_voxelize(cloud, VS, CR, max_points=8,
                                      max_voxels=5000)
    vb, cb, nb = native.hard_voxelize(cloud, VS, CR, max_points=8,
                                      max_voxels=5000, force_numpy=True)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(na, nb)
    np.testing.assert_allclose(va, vb)
    assert len(ca) > 0 and na.max() <= 8
    # voxel coords consistent with the points stored inside
    cr = np.asarray(CR[:3], np.float32)
    for v in range(min(20, len(ca))):
        p = va[v, : na[v], :3]
        expect = np.floor((p - cr) / np.asarray(VS)).astype(np.int32)
        np.testing.assert_array_equal(
            expect, np.repeat(ca[v][None], na[v], axis=0)
        )


def test_hard_voxelize_caps(cloud):
    v, c, n = native.hard_voxelize(cloud, VS, CR, max_points=2, max_voxels=50)
    assert len(c) == 50
    assert n.max() <= 2


def test_knn_matches_numpy(cloud):
    q = cloud[:64]
    ia, da = native.knn(cloud, q, 5)
    ib, db = native.knn(cloud, q, 5, force_numpy=True)
    np.testing.assert_allclose(da, db, rtol=1e-5)
    # nearest neighbor of a point within the set is itself
    assert (ia[:, 0] == np.arange(64)).all()
    # distance sets agree (tie order may differ)
    np.testing.assert_allclose(np.sort(da, 1), np.sort(db, 1), rtol=1e-5)


def test_ball_query_matches_numpy(cloud):
    q = cloud[:32]
    a = native.ball_query(cloud, q, radius=3.0, nsample=8)
    b = native.ball_query(cloud, q, radius=3.0, nsample=8, force_numpy=True)
    np.testing.assert_array_equal(a, b)
    # every returned index is actually inside the ball
    for i in range(len(q)):
        d = np.linalg.norm(cloud[a[i], :3] - q[i, :3], axis=1)
        assert (d < 3.0).all()


def test_fps_matches_numpy(cloud):
    a = native.furthest_point_sample(cloud, 32)
    b = native.furthest_point_sample(cloud, 32, force_numpy=True)
    np.testing.assert_array_equal(a, b)
    assert a[0] == 0 and len(set(a.tolist())) == 32
    # FPS spreads: min pairwise distance among samples exceeds random pick
    p = cloud[a, :3]
    d = np.linalg.norm(p[:, None] - p[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    rng = np.random.default_rng(1)
    rp = cloud[rng.choice(len(cloud), 32, replace=False), :3]
    dr = np.linalg.norm(rp[:, None] - rp[None], axis=-1)
    np.fill_diagonal(dr, np.inf)
    assert d.min() > dr.min()


def test_three_nn_and_interpolate(cloud):
    unknown = cloud[:16, :3] + 0.01
    d2, idx = native.three_nn(unknown, cloud[:, :3])
    d2n, idxn = native.three_nn(unknown, cloud[:, :3], force_numpy=True)
    np.testing.assert_allclose(d2, d2n, rtol=1e-4)
    feats = np.random.default_rng(2).normal(size=(len(cloud), 6)).astype(np.float32)
    interp = native.three_interpolate(feats, idx, d2)
    # nearly-coincident query -> interpolation ~ the nearest feature
    np.testing.assert_allclose(interp, feats[idx[:, 0]], atol=0.2)


def test_points_in_boxes_matches_numpy():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    boxes = np.array([
        [0, 0, -1, 4, 2, 2, 0.3],
        [5, 5, -1, 2, 2, 2, 1.0],
    ], np.float32)
    a = native.points_in_boxes(pts, boxes)
    b = native.points_in_boxes(pts, boxes, force_numpy=True)
    np.testing.assert_array_equal(a, b)
    assert (a >= -1).all() and (a < 2).all()
    # consistency with the corner-based geometry test
    from mobi_tpu.data.geometry import points_in_bbox_corners
    from mobi_tpu.ops.box3d import box_corners_bev

    import jax.numpy as jnp
    corners_bev = np.asarray(box_corners_bev(jnp.asarray(boxes)))  # [B,4,2]
    for bi in range(2):
        z0 = boxes[bi, 2]
        corners = np.concatenate([
            np.concatenate([corners_bev[bi], np.full((4, 1), z0)], 1),
            np.concatenate([corners_bev[bi], np.full((4, 1), z0 + boxes[bi, 5])], 1),
        ])
        inside_corner = points_in_bbox_corners(pts, corners[None])[:, 0]
        inside_native = a == bi
        # points in overlapping boxes may differ on first-wins; here boxes
        # are disjoint so the sets must match
        np.testing.assert_array_equal(inside_native, inside_corner)

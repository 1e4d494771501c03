"""Rotated 3D IoU + NMS (mobi_tpu.ops.box3d) — semantics of the reference
CUDA kernels (bevfusion/mmdet3d/ops/iou3d/src/iou3d_kernel.cu), validated
against analytic cases and a Monte-Carlo rasterization oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.ops.box3d import box_corners_bev, iou_3d, iou_bev, nms_3d


def B(x, y, z, dx, dy, dz, yaw):
    return np.array([x, y, z, dx, dy, dz, yaw], np.float32)


def mc_iou_bev(a, b, n=400):
    """Monte-Carlo grid oracle: fraction of area covered by both boxes."""
    lo = np.minimum(a[:2] - max(a[3], a[4]), b[:2] - max(b[3], b[4]))
    hi = np.maximum(a[:2] + max(a[3], a[4]), b[:2] + max(b[3], b[4]))
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)

    def inside(box):
        c, s = np.cos(box[6]), np.sin(box[6])
        rel = pts - box[:2]
        lx = rel[:, 0] * c + rel[:, 1] * s
        ly = -rel[:, 0] * s + rel[:, 1] * c
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    ia, ib = inside(a), inside(b)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    inter = (ia & ib).sum() * cell
    union = a[3] * a[4] + b[3] * b[4] - inter
    return inter / union


def test_corners_shape_and_area():
    box = B(1, 2, 0, 4, 2, 1.5, 0.3)
    c = np.asarray(box_corners_bev(jnp.asarray(box[None])))[0]
    assert c.shape == (4, 2)
    # shoelace area == dx*dy regardless of yaw
    area = 0.5 * abs(sum(
        c[i, 0] * c[(i + 1) % 4, 1] - c[i, 1] * c[(i + 1) % 4, 0]
        for i in range(4)
    ))
    np.testing.assert_allclose(area, 8.0, rtol=1e-5)


def test_identical_box_iou_is_one():
    boxes = jnp.asarray(np.stack([B(0, 0, 0, 4, 2, 1.5, 0.7)]))
    np.testing.assert_allclose(np.asarray(iou_bev(boxes, boxes)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou_3d(boxes, boxes)), 1.0, atol=1e-5)


def test_axis_aligned_overlap_analytic():
    a = B(0, 0, 0, 2, 2, 2, 0)
    b = B(1, 0, 0, 2, 2, 2, 0)      # x-shift 1 -> inter 2, union 6
    got = float(iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    np.testing.assert_allclose(got, 2 / 6, atol=1e-5)


def test_rotated_square_octagon_analytic():
    """Unit square vs the same square rotated 45 deg: intersection is a
    regular octagon of area 2*(sqrt(2)-1)."""
    a = B(0, 0, 0, 1, 1, 1, 0)
    b = B(0, 0, 0, 1, 1, 1, np.pi / 4)
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    got = float(iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_disjoint_boxes_zero():
    a = B(0, 0, 0, 2, 2, 2, 0.5)
    b = B(10, 10, 0, 2, 2, 2, 1.0)
    got = float(iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert got == 0.0


def test_containment():
    a = B(0, 0, 0, 4, 4, 2, 0.3)
    b = B(0, 0, 0, 2, 2, 2, 1.2)    # fully inside a
    got = float(iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    np.testing.assert_allclose(got, 4 / 16, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_pairs_vs_monte_carlo(seed):
    rng = np.random.default_rng(seed)
    boxes_a, boxes_b = [], []
    for _ in range(6):
        boxes_a.append(B(*rng.uniform(-2, 2, 2), 0,
                         *rng.uniform(1, 4, 2), 2, rng.uniform(0, np.pi)))
        boxes_b.append(B(*rng.uniform(-2, 2, 2), 0,
                         *rng.uniform(1, 4, 2), 2, rng.uniform(0, np.pi)))
    A, Bx = np.stack(boxes_a), np.stack(boxes_b)
    got = np.asarray(iou_bev(jnp.asarray(A), jnp.asarray(Bx)))
    for i in range(len(A)):
        for j in range(len(Bx)):
            ref = mc_iou_bev(A[i], Bx[j])
            np.testing.assert_allclose(got[i, j], ref, atol=0.02,
                                       err_msg=f"pair {i},{j}")


def test_iou3d_z_overlap():
    a = B(0, 0, 0, 2, 2, 2, 0)
    b = B(0, 0, 1, 2, 2, 2, 0)      # z-shift 1 -> z-overlap 1 of 2
    got = float(iou_3d(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    np.testing.assert_allclose(got, 4.0 / 12.0, atol=1e-5)  # 2*2*1 / (8+8-4)
    c = B(0, 0, 5, 2, 2, 2, 0)      # disjoint in z
    got = float(iou_3d(jnp.asarray(a[None]), jnp.asarray(c[None]))[0, 0])
    assert got == 0.0


def test_nms_greedy_semantics():
    boxes = jnp.asarray(np.stack([
        B(0, 0, 0, 4, 2, 1.5, 0.0),     # score .9 kept
        B(0.2, 0, 0, 4, 2, 1.5, 0.05),  # heavy overlap w/ 0 -> suppressed
        B(10, 0, 0, 4, 2, 1.5, 0.0),    # far away -> kept
        B(0.1, 0.1, 0, 4, 2, 1.5, 0.0), # overlap w/ 0 -> suppressed
    ]))
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_3d(boxes, scores, iou_threshold=0.5))
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_nms_keeps_highest_score_regardless_of_order():
    rng = np.random.default_rng(4)
    base = B(0, 0, 0, 4, 2, 1.5, 0.2)
    boxes = np.stack([base + np.concatenate([rng.normal(0, 0.05, 2), np.zeros(5)])
                      for _ in range(8)])
    scores = rng.uniform(0, 1, 8).astype(np.float32)
    keep = np.asarray(nms_3d(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.sum() == 1
    assert keep[int(np.argmax(scores))]

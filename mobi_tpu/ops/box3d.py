"""Rotated 3D-box IoU and NMS — jit-friendly JAX (runs on TPU and CPU).

TPU-native equivalent of the reference's CUDA kernels
(/root/reference/bevfusion/mmdet3d/ops/iou3d/src/iou3d_kernel.cu: rotated
BEV overlap via polygon clipping, boxes_iou_bev, nms_gpu): the pairwise
rotated-rectangle intersection is a fixed-size Sutherland-Hodgman clip —
every intermediate polygon lives in a static [V, 2] buffer with a validity
count, so the whole NxM IoU matrix is one vmapped, branch-free program that
XLA tiles onto the VPU; greedy NMS is a `lax.fori_loop` over a precomputed
IoU matrix.

Box parametrization: [x, y, z, dx, dy, dz, yaw] (center, full sizes, heading
about +z), matching the mmdet3d LiDAR box convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-8


def box_corners_bev(boxes: Array) -> Array:
    """[N, 7] -> [N, 4, 2] CCW footprint corners."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # CCW unit square corners scaled by half-sizes
    ux = jnp.stack([dx, dx, -dx, -dx], axis=-1) * 0.5
    uy = jnp.stack([-dy, dy, dy, -dy], axis=-1) * 0.5
    cx = x[..., None] + ux * c[..., None] - uy * s[..., None]
    cy = y[..., None] + ux * s[..., None] + uy * c[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _polygon_area(verts: Array, count: Array) -> Array:
    """Shoelace area of the first `count` vertices of a padded [V, 2] buffer.

    Padding beyond `count` must equal verts[0] (the closure vertex), which
    contributes zero to the cyclic sum.
    """
    nxt = jnp.roll(verts, -1, axis=0)
    cross = verts[:, 0] * nxt[:, 1] - verts[:, 1] * nxt[:, 0]
    return 0.5 * jnp.abs(jnp.sum(cross))


def _clip_by_edge(verts: Array, count: Array, p1: Array, p2: Array):
    """One Sutherland-Hodgman pass: clip (verts, count) by the half-plane on
    the LEFT of directed edge p1->p2. Buffer grows by a factor of 2."""
    v = verts.shape[0]
    idx = jnp.arange(v)
    valid = idx < count
    nxt_idx = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = verts
    nxt = verts[nxt_idx]

    edge = p2 - p1

    def side(q):
        return edge[0] * (q[..., 1] - p1[1]) - edge[1] * (q[..., 0] - p1[0])

    cur_in = side(cur) >= 0
    nxt_in = side(nxt) >= 0

    # intersection of segment cur->nxt with the edge line
    d_cur = side(cur)
    d_nxt = side(nxt)
    t = d_cur / jnp.where(jnp.abs(d_cur - d_nxt) < _EPS, _EPS, d_cur - d_nxt)
    inter = cur + t[:, None] * (nxt - cur)

    # per input vertex: slot0 = cur (if inside), slot1 = intersection (if
    # the segment crosses the edge)
    keep_cur = valid & cur_in
    keep_int = valid & (cur_in != nxt_in)
    cand = jnp.stack([cur, inter], axis=1).reshape(2 * v, 2)
    keep = jnp.stack([keep_cur, keep_int], axis=1).reshape(2 * v)

    # stable compaction: valid candidates move to the front in order
    order = jnp.argsort(~keep, stable=True)
    out = cand[order]
    new_count = jnp.sum(keep)
    # pad the tail with the first vertex so the shoelace closure is exact
    pad = jnp.where(new_count > 0, out[0], jnp.zeros((2,)))
    out = jnp.where((jnp.arange(2 * v) < new_count)[:, None], out, pad[None])
    return out, new_count


def _quad_intersection_area(poly_a: Array, poly_b: Array) -> Array:
    """Intersection area of two CCW quads ([4, 2] each), branch-free."""
    verts = poly_a
    count = jnp.asarray(4, jnp.int32)
    for k in range(4):
        verts, count = _clip_by_edge(
            verts, count, poly_b[k], poly_b[(k + 1) % 4]
        )
    area = _polygon_area(verts, count)
    return jnp.where(count >= 3, area, 0.0)


@jax.jit
def iou_bev(boxes_a: Array, boxes_b: Array) -> Array:
    """Pairwise rotated BEV IoU: [N, 7] x [M, 7] -> [N, M]
    (iou3d_kernel.cu boxes_iou_bev semantics)."""
    ca = box_corners_bev(boxes_a)
    cb = box_corners_bev(boxes_b)
    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _quad_intersection_area(a, b))(cb)
    )(ca)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, _EPS)


@jax.jit
def iou_3d(boxes_a: Array, boxes_b: Array) -> Array:
    """Pairwise rotated 3D IoU with z-extent overlap: [N, 7] x [M, 7] ->
    [N, M] (iou3d.cpp boxes_iou3d_gpu semantics)."""
    ca = box_corners_bev(boxes_a)
    cb = box_corners_bev(boxes_b)
    inter_bev = jax.vmap(
        lambda a: jax.vmap(lambda b: _quad_intersection_area(a, b))(cb)
    )(ca)
    za_lo = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za_hi = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb_lo = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb_hi = boxes_b[:, 2] + boxes_b[:, 5] / 2
    z_ov = jnp.maximum(
        jnp.minimum(za_hi[:, None], zb_hi[None]) -
        jnp.maximum(za_lo[:, None], zb_lo[None]),
        0.0,
    )
    inter = inter_bev * z_ov
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None]
    return inter / jnp.maximum(vol_a + vol_b - inter, _EPS)


@functools.partial(jax.jit, static_argnames=("bev",))
def nms_3d(
    boxes: Array, scores: Array, iou_threshold: float = 0.5, bev: bool = True
) -> Array:
    """Greedy rotated NMS (iou3d nms_gpu semantics).

    Returns a boolean keep mask aligned with the input order. Boxes are
    processed in descending score order; a box is kept iff no
    previously-kept box overlaps it above `iou_threshold`.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = iou_bev(sorted_boxes, sorted_boxes) if bev else iou_3d(
        sorted_boxes, sorted_boxes
    )

    def body(i, keep):
        overlapped = jnp.any(keep & (iou[:, i] > iou_threshold) &
                             (jnp.arange(n) < i))
        return keep.at[i].set(~overlapped)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep

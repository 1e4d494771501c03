"""Accelerator-side voxel ops: BEV pooling and dynamic scatter.

TPU-native equivalents of the reference CUDA kernels:
  * bev_pool  — LSS camera-frustum feature pooling
    (/root/reference/bevfusion/mmdet3d/ops/bev_pool/src/bev_pool_cuda.cu:
    interval-based sum of frustum features into BEV cells). On TPU this is a
    single `segment_sum` over linearized cell ranks — XLA lowers it to a
    sorted scatter-add that saturates HBM bandwidth; no interval bookkeeping
    needed.
  * dynamic_scatter — per-voxel mean/max feature reduction
    (ops/voxel/src/scatter_points_cuda.cu DynamicScatter): `segment_sum` /
    `segment_max` over voxel ids.

Both are jit-friendly with STATIC output shapes: callers pass the cell/voxel
count; invalid entries carry id = num_segments (dropped bucket).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def bev_pool(
    feats: Array,
    coords: Array,
    batch_size: int,
    bev_z: int,
    bev_h: int,
    bev_w: int,
) -> Array:
    """Sum frustum-point features into BEV cells.

    Args:
      feats:  [N, C] per-frustum-point features.
      coords: [N, 4] int (batch, z, y, x) BEV cell of each point; any
              coordinate < 0 or >= its extent marks the point invalid.

    Returns [B, Z, H, W, C] (reference bev_pool returns B, Z, H, W, C before
    the caller's channel-collapse)."""
    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    valid = (
        (b >= 0) & (b < batch_size)
        & (z >= 0) & (z < bev_z)
        & (y >= 0) & (y < bev_h)
        & (x >= 0) & (x < bev_w)
    )
    n_cells = batch_size * bev_z * bev_h * bev_w
    rank = ((b * bev_z + z) * bev_h + y) * bev_w + x
    rank = jnp.where(valid, rank, n_cells)  # overflow bucket, dropped below
    out = jax.ops.segment_sum(feats, rank, num_segments=n_cells + 1)
    return out[:n_cells].reshape(batch_size, bev_z, bev_h, bev_w, -1)


def dynamic_voxelize_jax(
    points: Array, voxel_size, coors_range, grid_size
) -> Array:
    """[N, >=3] -> [N, 3] (x, y, z) grid coords, -1 out of range — the
    jit-side mirror of mobi_tpu.native.dynamic_voxelize."""
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(coors_range[:3], jnp.float32)
    grid = jnp.asarray(grid_size, jnp.int32)
    c = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    bad = ((c < 0) | (c >= grid)).any(axis=1)
    return jnp.where(bad[:, None], -1, c)


def dynamic_scatter(
    feats: Array,
    voxel_ids: Array,
    num_voxels: int,
    reduce: str = "mean",
) -> Array:
    """Reduce point features into their voxel (DynamicScatter semantics).

    Args:
      feats: [N, C]; voxel_ids: [N] int in [0, num_voxels) or < 0 (dropped).
      reduce: 'mean' | 'max' | 'sum'.

    Returns [num_voxels, C]; empty voxels are 0."""
    ids = jnp.where(voxel_ids < 0, num_voxels, voxel_ids)
    if reduce in ("mean", "sum"):
        s = jax.ops.segment_sum(feats, ids, num_segments=num_voxels + 1)
        if reduce == "sum":
            return s[:num_voxels]
        cnt = jax.ops.segment_sum(
            jnp.ones((feats.shape[0],), feats.dtype), ids,
            num_segments=num_voxels + 1,
        )
        return s[:num_voxels] / jnp.maximum(cnt[:num_voxels, None], 1.0)
    if reduce == "max":
        m = jax.ops.segment_max(feats, ids, num_segments=num_voxels + 1)
        # segment_max initializes empty segments with -inf
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        return m[:num_voxels]
    raise ValueError(f"unknown reduce {reduce}")

"""PointNet++-family device ops expressed as JAX gathers/contractions.

The irregular neighbor-search ops (knn, ball_query, furthest_point_sample,
three_nn) live in the C++ host library (mobi_tpu/native); the ops here are
the ones that belong ON the accelerator because they are dense
gather+contract patterns XLA maps straight to the MXU/VPU:

  * gather_points / group_points — reference ops/gather_points, group_points
    (CUDA gather kernels): `jnp.take_along_axis` lowers to a single gather.
  * three_interpolate — reference ops/interpolate/three_interpolate: weighted
    sum of 3 neighbor features.
  * assign_score_withk — PAConv's scored weight-bank aggregation
    (/root/reference/bevfusion/mmdet3d/ops/paconv/assign_score.py:25-100):
    out[b, d, i, k] = agg_m scores[b,i,k,m] *
        (point_feat[b, knn[b,i,k], m, d] - center_feat[b, knn[b,i,0], m, d])
    — one gather + one einsum here (the CUDA kernel exists purely to avoid
    torch materializing the gathered [B,npoint,K,M,D] tensor; XLA fuses the
    gather into the contraction)."""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def gather_points(features: Array, idx: Array) -> Array:
    """features [B, N, C], idx [B, S] -> [B, S, C]
    (ops/gather_points CUDA semantics, channel-last here)."""
    return jnp.take_along_axis(features, idx[..., None], axis=1)


def group_points(features: Array, idx: Array) -> Array:
    """features [B, N, C], idx [B, S, K] -> [B, S, K, C]."""
    b, s, k = idx.shape
    flat = gather_points(features, idx.reshape(b, s * k))
    return flat.reshape(b, s, k, features.shape[-1])


def three_interpolate(features: Array, idx: Array, weight: Array) -> Array:
    """features [B, M, C], idx [B, N, 3], weight [B, N, 3] -> [B, N, C]
    (ops/interpolate three_interpolate: inverse-distance-weighted sum of the
    3 nearest known features; idx/weight from native.three_nn)."""
    neigh = group_points(features, idx)  # [B, N, 3, C]
    return (neigh * weight[..., None]).sum(axis=2)


def assign_score_withk(
    scores: Array,          # [B, npoint, K, M]
    point_features: Array,  # [B, N, M, D]
    center_features: Array,  # [B, N, M, D]
    knn_idx: Array,         # [B, npoint, K]; column 0 is the center itself
    aggregate: str = "sum",
) -> Array:
    """PAConv scored aggregation -> [B, D, npoint, K] (CUDA-op layout)."""
    b, npoint, k = knn_idx.shape
    gathered = group_points(
        point_features.reshape(b, point_features.shape[1], -1), knn_idx
    ).reshape(b, npoint, k, *point_features.shape[2:])  # [B, np, K, M, D]
    centers = group_points(
        center_features.reshape(b, center_features.shape[1], -1),
        knn_idx[:, :, :1],
    ).reshape(b, npoint, 1, *center_features.shape[2:])  # [B, np, 1, M, D]
    diff = gathered - centers                             # [B, np, K, M, D]
    if aggregate == "sum":
        out = jnp.einsum("bikm,bikmd->bikd", scores, diff)
    elif aggregate == "avg":
        out = jnp.einsum("bikm,bikmd->bikd", scores, diff) / scores.shape[-1]
    elif aggregate == "max":
        out = jnp.max(scores[..., None] * diff, axis=3)
    else:
        raise ValueError(f"unknown aggregate: {aggregate}")
    return out.transpose(0, 3, 1, 2)  # [B, D, npoint, K]

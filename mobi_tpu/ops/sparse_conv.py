"""Submanifold / strided sparse 3D convolution as gather-GEMM-scatter.

TPU-native equivalent of the reference spconv kernels
(/root/reference/bevfusion/mmdet3d/ops/spconv/src/{indice.cc, indice_cuda.cu,
reordering.cc, reordering_cuda.cu, maxpool.cc}): spconv's algorithm is
(1) build index "rulebook" pairs (input idx, output idx) per kernel offset,
(2) gather input rows, (3) per-offset GEMM with that offset's weight slice,
(4) scatter-add into output rows. On TPU the same structure maps cleanly:
the rulebook is built HOST-side (hash maps over integer coords — irregular,
cheap, done once per point cloud in the input pipeline), padded to static
shapes, and the device program is pure gather + batched matmul (MXU) +
segment-sum scatter — branch-free, jit-compatible.

Box convention: coords are integer [N, 3] (x, y, z) voxel indices (batch
handled by the caller via an extra leading coordinate if needed).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Rulebook:
    """Static-shape gather/scatter plan for one sparse conv layer.

    in_idx / out_idx: [K, P] padded index pairs per kernel offset (pad rows
    point at index n_in / n_out respectively and carry zero contribution).
    counts[k] = number of real pairs for offset k.

    Registered as a jax pytree (index arrays are children, n_in/n_out are
    static aux data) so plans can ride through jit/pjit argument trees —
    the detector train step takes its per-cloud plans as part of the batch.
    """

    in_idx: np.ndarray     # int32 [K, P]
    out_idx: np.ndarray    # int32 [K, P]
    counts: np.ndarray     # int32 [K]
    out_coords: np.ndarray  # int32 [M, 3]
    n_in: int
    n_out: int


jax.tree_util.register_pytree_node(
    Rulebook,
    lambda rb: (
        (rb.in_idx, rb.out_idx, rb.counts, rb.out_coords),
        (rb.n_in, rb.n_out),
    ),
    lambda aux, children: Rulebook(*children, n_in=aux[0], n_out=aux[1]),
)


def pad_rulebook(rb: Rulebook, pairs_to: int, out_to: int,
                 n_in: int | None = None) -> Rulebook:
    """Pad a rulebook to static shapes so successive clouds share one
    compiled program (TPU: no per-step recompiles).

    pairs_to: padded pair count P per kernel offset (pad rows keep pointing
    at the zero-contribution rows). out_to: padded output-site count — extra
    out_coords rows get a huge positive coordinate so the dense scatter
    drops them (scatter mode="drop"; a negative sentinel would WRAP under
    jnp's numpy-style indexing). n_in: padded input row count the gather will see
    (defaults to rb.n_in; pass the padded feature row count).
    """
    K, p = rb.in_idx.shape
    if pairs_to < p or out_to < rb.n_out:
        raise ValueError(
            f"pad_rulebook: caps (pairs_to={pairs_to}, out_to={out_to}) "
            f"below actual (pairs={p}, n_out={rb.n_out}); raise the static "
            "caps for this point-cloud density"
        )
    n_in = rb.n_in if n_in is None else int(n_in)
    in_idx = np.full((K, pairs_to), n_in, np.int32)
    out_idx = np.full((K, pairs_to), out_to, np.int32)
    in_idx[:, :p] = np.where(rb.in_idx == rb.n_in, n_in, rb.in_idx)
    out_idx[:, :p] = np.where(rb.out_idx == rb.n_out, out_to, rb.out_idx)
    out_coords = np.full((out_to, 3), np.int32(2**30), np.int32)
    out_coords[: rb.n_out] = rb.out_coords
    return Rulebook(
        in_idx=in_idx, out_idx=out_idx, counts=rb.counts,
        out_coords=out_coords, n_in=n_in, n_out=out_to,
    )


def _hash_coords(coords: np.ndarray) -> Dict[Tuple[int, int, int], int]:
    return {tuple(c): i for i, c in enumerate(coords.tolist())}


def build_rulebook(
    coords: np.ndarray,
    kernel_size: Sequence[int] = (3, 3, 3),
    stride: Sequence[int] = (1, 1, 1),
    padding: Sequence[int] = (0, 0, 0),
    spatial_shape: Sequence[int] | None = None,
    submanifold: bool = True,
    pad_to: int | None = None,
) -> Rulebook:
    """Build the (input, output) index pairs per kernel offset (host side;
    reference indice.cc getIndicePairs semantics).

    * submanifold: output sites == input sites; a pair (i -> o) exists when
      coords[i] == out_coords[o] + offset - kernel//2 (stride/padding
      ignored, like SubMConv3d).
    * strided (submanifold=False): standard sparse conv arithmetic —
      out * stride + offset - padding = in; output sites are the union of
      reachable cells, bounded by (spatial_shape + 2p - k)//s + 1 when
      `spatial_shape` is given (SparseConv3d semantics).
    """
    coords = np.asarray(coords, np.int64)
    n_in = len(coords)
    ks = [int(k) for k in kernel_size]
    st = [int(s) for s in stride]
    pd = [int(p) for p in padding]
    half = [k // 2 for k in ks]

    offsets = list(itertools.product(*[range(k) for k in ks]))
    pairs_in = [[] for _ in offsets]
    pairs_out = [[] for _ in offsets]

    if submanifold:
        out_coords = coords.copy()
        in_of = _hash_coords(coords)
        for oi, oc in enumerate(out_coords.tolist()):
            for k, off in enumerate(offsets):
                ic = tuple(oc[d] + off[d] - half[d] for d in range(3))
                ii = in_of.get(ic)
                if ii is not None:
                    pairs_in[k].append(ii)
                    pairs_out[k].append(oi)
    else:
        if spatial_shape is not None:
            out_shape = [
                (int(spatial_shape[d]) + 2 * pd[d] - ks[d]) // st[d] + 1
                for d in range(3)
            ]
        else:
            out_shape = None
        # discover output sites in input-scan order (first-seen)
        out_of: Dict[Tuple[int, int, int], int] = {}
        out_list: list = []
        for ii, ic in enumerate(coords.tolist()):
            for k, off in enumerate(offsets):
                tmp = tuple(ic[d] + pd[d] - off[d] for d in range(3))
                if any(t % st[d] != 0 or t < 0 for d, t in enumerate(tmp)):
                    continue
                oc = tuple(t // st[d] for d, t in enumerate(tmp))
                if out_shape is not None and any(
                    oc[d] >= out_shape[d] for d in range(3)
                ):
                    continue
                oi = out_of.get(oc)
                if oi is None:
                    oi = out_of[oc] = len(out_list)
                    out_list.append(oc)
                pairs_in[k].append(ii)
                pairs_out[k].append(oi)
        out_coords = np.asarray(out_list, np.int64).reshape(-1, 3)

    counts = np.asarray([len(p) for p in pairs_in], np.int32)
    p = int(pad_to) if pad_to else max(1, int(counts.max()))
    K = len(offsets)
    in_idx = np.full((K, p), n_in, np.int32)
    out_idx = np.full((K, p), len(out_coords), np.int32)
    for k in range(K):
        in_idx[k, : counts[k]] = pairs_in[k]
        out_idx[k, : counts[k]] = pairs_out[k]
    return Rulebook(
        in_idx=in_idx, out_idx=out_idx, counts=counts,
        out_coords=out_coords.astype(np.int32),
        n_in=n_in, n_out=len(out_coords),
    )


def sparse_conv_apply(
    features: Array,
    weights: Array,
    rulebook: Rulebook,
    bias: Array | None = None,
) -> Array:
    """Device-side sparse conv: gather -> per-offset GEMM -> scatter-add.

    features: [N_in, C_in]; weights: [K, C_in, C_out] (K = prod(kernel));
    returns [N_out, C_out]. Pure jnp — jit/pjit/vmap compatible."""
    n_out = rulebook.n_out
    # pad a zero row so pad indices contribute nothing
    f = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[-1]), features.dtype)], axis=0
    )
    in_idx = jnp.asarray(rulebook.in_idx)
    out_idx = jnp.asarray(rulebook.out_idx)
    gathered = f[in_idx]                       # [K, P, Cin]
    # batched GEMM over kernel offsets -> MXU
    prod = jnp.einsum(
        "kpc,kcd->kpd", gathered, weights.astype(features.dtype),
        preferred_element_type=jnp.float32,
    )
    out = jax.ops.segment_sum(
        prod.reshape(-1, prod.shape[-1]),
        out_idx.reshape(-1),
        num_segments=n_out + 1,
    )[:n_out].astype(features.dtype)
    if bias is not None:
        out = out + bias
    return out


def sparse_maxpool_apply(features: Array, rulebook: Rulebook) -> Array:
    """Sparse max pooling over the same rulebook structure
    (ops/spconv/src/maxpool.cc): max over all inputs mapped to each output."""
    f = jnp.concatenate(
        [features, jnp.full((1, features.shape[-1]), -jnp.inf, features.dtype)],
        axis=0,
    )
    gathered = f[jnp.asarray(rulebook.in_idx)].reshape(-1, features.shape[-1])
    out = jax.ops.segment_max(
        gathered, jnp.asarray(rulebook.out_idx).reshape(-1),
        num_segments=rulebook.n_out + 1,
    )[: rulebook.n_out]
    return jnp.where(jnp.isfinite(out), out, 0.0)


def densify(
    features: np.ndarray, coords: np.ndarray, grid: Sequence[int]
) -> np.ndarray:
    """Scatter sparse (features, coords) into a dense [X, Y, Z, C] grid —
    test/debug helper."""
    out = np.zeros((*grid, features.shape[-1]), np.asarray(features).dtype)
    c = np.asarray(coords)
    out[c[:, 0], c[:, 1], c[:, 2]] = np.asarray(features)
    return out

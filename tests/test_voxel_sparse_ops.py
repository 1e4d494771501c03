"""Accelerator-side voxel ops: bev_pool, dynamic scatter, sparse conv.

Oracles: dense 3D convolution (XLA) for the submanifold conv, direct numpy
window sums for the strided conv, plain indexing for pooling."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.ops.sparse_conv import (
    Rulebook,
    build_rulebook,
    densify,
    sparse_conv_apply,
    sparse_maxpool_apply,
)
from mobi_tpu.ops.voxel_ops import bev_pool, dynamic_scatter, dynamic_voxelize_jax


def random_sparse(grid=(8, 8, 6), n=60, c=5, seed=0):
    rng = np.random.default_rng(seed)
    all_coords = np.array(
        list(itertools.product(*[range(g) for g in grid])), np.int32
    )
    pick = rng.choice(len(all_coords), size=n, replace=False)
    coords = all_coords[pick]
    feats = rng.normal(size=(n, c)).astype(np.float32)
    return coords, feats


def test_bev_pool_sums_into_cells():
    feats = jnp.asarray(np.eye(4, dtype=np.float32))  # 4 points, C=4
    coords = jnp.asarray([
        [0, 0, 1, 1],
        [0, 0, 1, 1],   # same cell as point 0
        [0, 1, 0, 2],
        [0, 0, 5, 0],   # out of range (y >= bev_h) -> dropped
    ], jnp.int32)
    out = bev_pool(feats, coords, batch_size=1, bev_z=2, bev_h=4, bev_w=4)
    assert out.shape == (1, 2, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0, 1, 1]), [1, 1, 0, 0])
    np.testing.assert_allclose(np.asarray(out[0, 1, 0, 2]), [0, 0, 1, 0])
    assert float(jnp.abs(out).sum()) == 3.0  # dropped point contributes 0


def test_dynamic_voxelize_jax_matches_native():
    from mobi_tpu import native

    rng = np.random.default_rng(1)
    pts = rng.uniform(-40, 40, (500, 4)).astype(np.float32)
    vs, cr = (0.5, 0.5, 0.5), (-40, -40, -40, 40, 40, 40)
    grid = np.round((np.asarray(cr[3:]) - np.asarray(cr[:3])) / np.asarray(vs)).astype(int)
    a = np.asarray(dynamic_voxelize_jax(jnp.asarray(pts), vs, cr, grid))
    b = native.dynamic_voxelize(pts, vs, cr, force_numpy=True)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("reduce", ["mean", "max", "sum"])
def test_dynamic_scatter_reductions(reduce):
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, -6.0], [9.0, 9.0]])
    ids = jnp.asarray([0, 0, 2, -1])  # -1 dropped
    out = np.asarray(dynamic_scatter(feats, ids, num_voxels=3, reduce=reduce))
    if reduce == "mean":
        np.testing.assert_allclose(out[0], [2.0, 3.0])
    elif reduce == "sum":
        np.testing.assert_allclose(out[0], [4.0, 6.0])
    else:
        np.testing.assert_allclose(out[0], [3.0, 4.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # empty voxel
    np.testing.assert_allclose(out[2], [5.0, -6.0])


def test_submanifold_conv_matches_dense_conv():
    grid = (8, 8, 6)
    coords, feats = random_sparse(grid, n=60, c=5, seed=2)
    cin, cout = 5, 7
    rng = np.random.default_rng(3)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1

    rb = build_rulebook(coords, (3, 3, 3), submanifold=True)
    out = np.asarray(sparse_conv_apply(jnp.asarray(feats), jnp.asarray(w), rb))

    # dense oracle: conv3d SAME over the densified grid, read at active sites
    dense = densify(feats, coords, grid)          # [X, Y, Z, C]
    wk = w.reshape(3, 3, 3, cin, cout)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(dense[None]), jnp.asarray(wk), (1, 1, 1), "SAME",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
    )[0]
    ref_at = np.asarray(ref)[coords[:, 0], coords[:, 1], coords[:, 2]]
    np.testing.assert_allclose(out, ref_at, atol=1e-4)


def test_strided_sparse_conv_matches_window_sum():
    grid = (8, 8, 8)
    coords, feats = random_sparse(grid, n=50, c=4, seed=4)
    cin, cout = 4, 6
    rng = np.random.default_rng(5)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1  # k=2

    rb = build_rulebook(coords, (2, 2, 2), stride=(2, 2, 2), submanifold=False)
    out = np.asarray(sparse_conv_apply(jnp.asarray(feats), jnp.asarray(w), rb))
    assert rb.n_out == len(np.unique(coords // 2, axis=0))

    dense = densify(feats, coords, grid)
    wk = w.reshape(2, 2, 2, cin, cout)
    for oi, oc in enumerate(rb.out_coords):
        acc = np.zeros(cout, np.float32)
        for ox, oy, oz in itertools.product(range(2), repeat=3):
            x, y, z = oc[0] * 2 + ox, oc[1] * 2 + oy, oc[2] * 2 + oz
            acc += dense[x, y, z] @ wk[ox, oy, oz]
        np.testing.assert_allclose(out[oi], acc, atol=1e-4, err_msg=str(oc))


def test_sparse_maxpool():
    coords = np.array([[0, 0, 0], [1, 0, 0], [4, 0, 0]], np.int32)
    feats = jnp.asarray([[1.0, -2.0], [3.0, -4.0], [5.0, 6.0]])
    rb = build_rulebook(coords, (2, 2, 2), stride=(2, 2, 2), submanifold=False)
    out = np.asarray(sparse_maxpool_apply(feats, rb))
    # cell (0,0,0) pools inputs 0 and 1; cell (2,0,0) pools input 2
    i0 = np.nonzero((rb.out_coords == [0, 0, 0]).all(1))[0][0]
    i2 = np.nonzero((rb.out_coords == [2, 0, 0]).all(1))[0][0]
    np.testing.assert_allclose(out[i0], [3.0, -2.0])
    np.testing.assert_allclose(out[i2], [5.0, 6.0])


def test_sparse_conv_jit_and_grad():
    coords, feats = random_sparse((6, 6, 6), n=30, c=4, seed=6)
    w = np.random.default_rng(7).normal(size=(27, 4, 4)).astype(np.float32) * 0.1
    rb = build_rulebook(coords, (3, 3, 3), submanifold=True)

    @jax.jit
    def f(feats, w):
        return sparse_conv_apply(feats, w, rb).sum()

    g = jax.grad(f, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    assert np.all(np.isfinite(np.asarray(g[0])))
    assert np.all(np.isfinite(np.asarray(g[1])))
    assert float(jnp.abs(g[1]).sum()) > 0

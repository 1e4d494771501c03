"""Static-shape sparse-conv plans (TPU jit stability).

pad_rulebook / plan_sparse_encoder(static_caps=...) pad per-cloud rulebooks
and voxel features to fixed shapes so successive point clouds share ONE
compiled program — on TPU a retrace per cloud means a trip through the
remote compile service per step. These tests pin:
  * padded rulebooks reproduce unpadded numerics exactly,
  * Rulebook rides through jit as a pytree (static n_in/n_out aux),
  * two clouds of different density produce identically-shaped inputs and
    the jitted detector train step compiles exactly once,
reference semantics: bevfusion spconv indice_pairs (ops/spconv/src/indice.cc)
padded to static shapes — a design choice the CUDA reference doesn't need.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.bevfusion import (
    BEVFusionDetector,
    SparseEncoderTPU,
    plan_sparse_encoder,
    prepare_lidar_inputs,
)
from mobi_tpu.models.detector_training import (
    make_detector_optimizer,
    make_detector_train_step,
    pad_gt,
)
from mobi_tpu.ops.sparse_conv import (
    Rulebook,
    build_rulebook,
    pad_rulebook,
    sparse_conv_apply,
)

GRID = (64, 64, 41)


def _coords(rng, n, grid=GRID):
    c = np.unique(
        np.stack(
            [rng.integers(0, g, n) for g in grid], axis=1
        ),
        axis=0,
    )
    return c.astype(np.int64)


def test_pad_rulebook_matches_unpadded():
    rng = np.random.default_rng(0)
    coords = _coords(rng, 300)
    n = len(coords)
    rb = build_rulebook(coords, (3, 3, 3), submanifold=True)
    f = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
    ref = sparse_conv_apply(f, w, rb)

    n_cap, out_cap = n + 37, n + 11
    rbp = pad_rulebook(rb, pairs_to=rb.in_idx.shape[1] + 5, out_to=out_cap,
                       n_in=n_cap)
    f_pad = jnp.concatenate([f, jnp.zeros((n_cap - n, 8), f.dtype)], axis=0)
    out = sparse_conv_apply(f_pad, w, rbp)
    np.testing.assert_allclose(np.asarray(out[:n]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # pad output rows carry zero contribution
    assert float(jnp.abs(out[n:]).max()) == 0.0


def test_pad_rulebook_rejects_too_small_caps():
    coords = _coords(np.random.default_rng(1), 100)
    rb = build_rulebook(coords, (3, 3, 3), submanifold=True)
    with pytest.raises(ValueError, match="static caps"):
        pad_rulebook(rb, pairs_to=1, out_to=rb.n_out + 1)


def test_rulebook_rides_through_jit():
    coords = _coords(np.random.default_rng(2), 50)
    rb = build_rulebook(coords, (3, 3, 3), submanifold=True)
    f = jnp.ones((len(coords), 4))
    w = jnp.ones((27, 4, 4))

    @jax.jit
    def step(f, batch):
        return sparse_conv_apply(f, w, batch["plans"]["subm0"]).sum()

    eager = sparse_conv_apply(f, w, rb).sum()
    np.testing.assert_allclose(
        float(step(f, {"plans": {"subm0": rb}})), float(eager), rtol=1e-5
    )


# uniform random clouds GROW through stride-2 (a lone voxel reaches up to 8
# outputs), unlike real lidar surfaces which shrink — size caps generously
CAPS = (1600, 6000, 8000, 8000, 8000)


def _cloud(seed, n):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [rng.uniform(-4.7, 4.7, (n, 2)), rng.uniform(-4.9, 2.9, (n, 1)),
         rng.uniform(0, 1, (n, 2))], axis=1,
    ).astype(np.float32)


def _prep(pts, static_caps=None):
    return prepare_lidar_inputs(
        pts, voxel_size=(0.15, 0.15, 0.2),
        pc_range=(-4.8, -4.8, -5, 4.8, 4.8, 3.2),
        max_voxels=CAPS[0], static_caps=static_caps,
    )


def test_static_caps_shapes_identical_across_clouds():
    a = _prep(_cloud(3, 900), static_caps=CAPS)
    b = _prep(_cloud(4, 1500), static_caps=CAPS)
    sa = jax.tree.map(lambda x: jnp.shape(x), a[:3])
    sb = jax.tree.map(lambda x: jnp.shape(x), b[:3])
    assert jax.tree_util.tree_structure(sa) == jax.tree_util.tree_structure(sb)
    assert jax.tree.leaves(sa) == jax.tree.leaves(sb)
    assert a[3] == b[3]  # out_shape


def test_static_caps_encoder_numerics_match_unpadded():
    pts = _cloud(5, 1000)
    feats, plans, out_coords, out_shape = _prep(pts)
    featsP, plansP, out_coordsP, out_shapeP = _prep(pts, static_caps=CAPS)
    assert out_shape == out_shapeP

    enc = SparseEncoderTPU()
    params = enc.init(jax.random.PRNGKey(0), feats, plans, out_coords,
                      out_shape)
    dense = enc.apply(params, feats, plans, out_coords, out_shape)
    denseP = enc.apply(params, featsP, plansP, out_coordsP, out_shapeP)
    np.testing.assert_allclose(
        np.asarray(denseP), np.asarray(dense), rtol=2e-4, atol=2e-4
    )


def test_detector_train_step_compiles_once_across_clouds():
    det = BEVFusionDetector(use_camera=False, num_proposals=16)
    tx = make_detector_optimizer(1e-3, total_steps=0)
    step = make_detector_train_step(det, tx)

    batches = []
    for seed, n in ((6, 900), (7, 1500)):
        feats, plans, out_coords, out_shape = _prep(_cloud(seed, n),
                                                    static_caps=CAPS)
        boxes = np.array([[1.0, 0.5, -1.0, 3.9, 1.7, 1.5, 0.2, 0.0, 0.0]],
                         np.float32)
        b, l, m = pad_gt(boxes, np.zeros((1,), np.int64), 8)
        batches.append((
            {
                "voxel_feats": feats, "plans": plans,
                "out_coords": out_coords,
                "gt_boxes": b[None], "gt_labels": l[None], "gt_mask": m[None],
            },
            out_shape,
        ))

    params = det.init(
        jax.random.PRNGKey(0), batches[0][0]["voxel_feats"],
        batches[0][0]["plans"], batches[0][0]["out_coords"], batches[0][1],
    )["params"]
    opt_state = tx.init(params)

    batch0, oshape0 = batches[0]
    params, opt_state, m0 = step(params, opt_state, batch0, oshape0)
    size_after_first = step._cache_size()
    batch1, oshape1 = batches[1]
    params, opt_state, m1 = step(params, opt_state, batch1, oshape1)
    assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
    # identical static shapes -> the second cloud reuses the first cloud's
    # executable, adding NO cache entry. (Don't assert an absolute count:
    # jax's cpp-jit cache is a GLOBAL LRU, so entries from this function
    # can be evicted by the rest of the suite's compilations.)
    assert step._cache_size() == size_after_first


def test_calibrate_static_caps_covers_expanding_clouds():
    """Uniform-random clouds EXPAND at stride-2 transitions (isolated
    voxels reach up to 8 outputs) — calibration must return caps that the
    same clouds then fit under, where a contraction schedule would raise."""
    from mobi_tpu.models.bevfusion import calibrate_static_caps

    clouds = [_cloud(s, 1200) for s in range(3)]
    caps = calibrate_static_caps(
        clouds, voxel_size=(0.15, 0.15, 0.2),
        pc_range=(-4.8, -4.8, -5, 4.8, 4.8, 3.2),
        max_voxels=1600, multiple=256,
    )
    assert len(caps) == 5 and caps[0] <= 1600
    shapes = set()
    for pts in clouds:
        feats, plans, out_coords, out_shape = _prep(pts, static_caps=caps)
        shapes.add((feats.shape, out_coords.shape, out_shape))
    assert len(shapes) == 1


def test_batched_detector_train_step_dp_mesh():
    """Batched detector training: static-cap plans make every sample's
    rulebook tree shape-identical, so the whole batch vmaps through ONE
    compiled program — and a dp mesh shards it across devices (the
    reference's torchpack/DDP multi-GPU training as a sharding
    annotation). Checks batched-loss == mean of single-sample losses."""
    from jax.sharding import Mesh

    from mobi_tpu.models.detector_training import (
        detector_loss_fn,
        make_batched_detector_train_step,
        stack_detector_batches,
    )
    from mobi_tpu.models.transfusion_loss import TransFusionLossConfig

    det = BEVFusionDetector(use_camera=False, num_proposals=16)
    tx = make_detector_optimizer(1e-3, total_steps=0)

    samples, oshape = [], None
    for seed, n in ((11, 800), (12, 1200), (13, 1000), (14, 600)):
        feats, plans, out_coords, oshape = _prep(_cloud(seed, n),
                                                 static_caps=CAPS)
        boxes = np.array([[1.0, 0.5, -1.0, 3.9, 1.7, 1.5, 0.2, 0.0, 0.0]],
                         np.float32)
        b, l, m = pad_gt(boxes, np.zeros((1,), np.int64), 8)
        samples.append({
            "voxel_feats": feats, "plans": plans, "out_coords": out_coords,
            "gt_boxes": b[None], "gt_labels": l[None], "gt_mask": m[None],
        })
    batch = stack_detector_batches(samples)
    assert batch["voxel_feats"].shape[0] == 4

    params = det.init(
        jax.random.PRNGKey(0), samples[0]["voxel_feats"],
        samples[0]["plans"], samples[0]["out_coords"], oshape,
    )["params"]
    opt_state = tx.init(params)

    devs = jax.devices("cpu")[:4]
    mesh = Mesh(np.asarray(devs), ("dp",))
    step = make_batched_detector_train_step(det, tx, mesh=mesh)
    with mesh:
        params2, opt_state, metrics = step(params, opt_state, batch, oshape)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    # batched mean-loss == mean of the single-sample losses
    cfg = TransFusionLossConfig(num_classes=det.num_classes,
                                num_proposals=det.num_proposals)
    singles = [
        float(detector_loss_fn(det, params, s, oshape, cfg)[0])
        for s in samples
    ]
    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(singles), rtol=2e-5
    )

    # params actually moved
    delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, params, params2), 0.0,
    )
    assert delta > 0

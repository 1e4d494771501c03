"""dp-sharded inference == single-device inference, sample for sample.

The reference bench samples on one GPU
(/root/reference/scripts/inference_test_bench.py:423-461); the rebuild's
mesh path (mobi_tpu.pipeline) must be a pure layout change: replicated
params, whole (camera, lidar) pairs per device, CFG doubling kept local to
each shard's sub-batch. Verified on the virtual 8-CPU-device mesh.

Tolerance: per-sample math is identical (dp shards the batch axis only; no
cross-sample reductions anywhere in the pipeline), but XLA tiles convs and
contractions differently for a local batch of 1 vs 8, reordering
within-reduction sums — measured |delta| <= ~1e-6 after a 3-step CFG DDIM.
Asserted at atol=1e-5 (10x margin), NOT bitwise: bit-identity across two
differently-compiled XLA programs is not a meaningful contract.
"""
import jax
import numpy as np
import pytest

from mobi_tpu.parallel.mesh import shard_batch
from mobi_tpu.pipeline import (
    inference_mesh,
    make_inpaint_pipeline,
    replicate_params,
)
from tests.test_diffusion import make_batch, tiny_model_and_params


@pytest.fixture(scope="module")
def setup():
    model, params = tiny_model_and_params()
    return model, params


def _run(model, params, batch, rng, mesh=None):
    fn = make_inpaint_pipeline(
        model, num_steps=3, guidance_scale=2.0, sampler="ddim", mesh=mesh
    )
    out = fn(params, batch, rng)
    return {k: np.asarray(v) for k, v in out.items()}


def test_dp8_matches_single_device(setup, cpu_devices):
    model, params = setup
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(11)

    ref = _run(model, jax.device_put(params, cpu_devices[0]), batch, rng)

    mesh = inference_mesh(devices=cpu_devices)
    out = _run(
        model, replicate_params(mesh, params), shard_batch(mesh, batch),
        rng, mesh=mesh,
    )

    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"dp-sharded {k} output differs from single-device",
        )


def test_vae_chunked_matches_unchunked(setup, cpu_devices):
    """`vae_chunk_pairs` is a pure HBM-peak lever: with posterior-MODE
    encodes (deterministic_encode) the lax.map-chunked VAE stages must
    reproduce the unchunked program sample for sample (contiguous pair
    chunks preserve the interleaved order; no cross-sample math in the VAE
    stages)."""
    model, params = setup
    params = jax.device_put(params, cpu_devices[0])
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(5)

    def run(chunk):
        fn = make_inpaint_pipeline(
            model, num_steps=3, guidance_scale=2.0, sampler="ddim",
            vae_chunk_pairs=chunk, deterministic_encode=True,
        )
        return {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}

    ref = run(0)
    out = run(2)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"vae-chunked {k} differs from unchunked",
        )


def test_vae_chunk_guards(setup, cpu_devices):
    model, params = setup
    with pytest.raises(ValueError, match="single-device"):
        make_inpaint_pipeline(
            model, vae_chunk_pairs=2, mesh=inference_mesh(devices=cpu_devices)
        )
    fn = make_inpaint_pipeline(model, num_steps=2, vae_chunk_pairs=3)
    with pytest.raises(ValueError, match="not divisible"):
        fn(jax.device_put(params, cpu_devices[0]), make_batch(b=8),
           jax.random.PRNGKey(0))


def test_segmented_matches_monolithic(setup, cpu_devices):
    """K-segment dispatch == one fused program, sample for sample: the
    segment body is the same scanned DDIM step over operand-sliced tables,
    and prep mirrors sample()'s rng plumbing, so splitting the trajectory
    across device programs must not change the math."""
    model, params = setup
    params = jax.device_put(params, cpu_devices[0])
    batch = make_batch(b=4)
    rng = jax.random.PRNGKey(9)

    def run(**kw):
        fn = make_inpaint_pipeline(
            model, num_steps=4, guidance_scale=2.0, sampler="ddim", **kw
        )
        return {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}

    ref = run()
    out = run(sample_segments=2)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"segmented {k} differs from monolithic",
        )

    # composes with VAE chunking (both levers on at once, as on the bench)
    both = make_inpaint_pipeline(
        model, num_steps=4, guidance_scale=2.0, sampler="ddim",
        sample_segments=2, vae_chunk_pairs=2,
    )
    o = both(params, batch, rng)
    assert all(np.isfinite(np.asarray(v)).all() for v in o.values())


def test_segmented_preflight_and_guards(setup, cpu_devices):
    model, params = setup
    params = jax.device_put(params, cpu_devices[0])
    batch = make_batch(b=4)
    rng = jax.random.PRNGKey(2)

    fn = make_inpaint_pipeline(
        model, num_steps=4, guidance_scale=2.0, sampler="ddim",
        sample_segments=2,
    )
    before = {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}
    # CPU exposes no HBM budget -> checks are skipped (False), never fail;
    # the AOT-compiled programs must produce the same outputs afterwards
    assert fn.preflight(params, batch, rng) is False
    after = {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=0, atol=1e-6)

    with pytest.raises(ValueError, match="not divisible"):
        make_inpaint_pipeline(model, num_steps=5, sample_segments=2)
    with pytest.raises(ValueError, match="exact ddim or plms"):
        make_inpaint_pipeline(model, sampler="ddpm", sample_segments=2)
    with pytest.raises(ValueError, match="exact ddim or plms"):
        make_inpaint_pipeline(
            model, num_steps=4, sample_segments=2, encoder_interval=2
        )


def test_dp_subset_mesh(setup, cpu_devices):
    """inference_mesh(dp=N) over a device prefix, uneven guidance off."""
    model, params = setup
    batch = make_batch(b=4)
    rng = jax.random.PRNGKey(3)

    ref = _run(model, jax.device_put(params, cpu_devices[0]), batch, rng)
    mesh = inference_mesh(dp=4, devices=cpu_devices)
    out = _run(
        model, replicate_params(mesh, params), shard_batch(mesh, batch),
        rng, mesh=mesh,
    )
    for k in ref:
        np.testing.assert_allclose(out[k], ref[k], rtol=0, atol=1e-5)


def test_segmented_plms_matches_monolithic(setup, cpu_devices):
    """Segmented PLMS == monolithic PLMS, sample for sample: the
    Adams-Bashforth eps-history ring (plms.py:221-237) is carried across
    segment boundaries as an operand and the prologue's double evaluation
    runs in the prep program, so splitting the trajectory must not change
    the multistep blend. Covers the reference test benches' default
    sampler (--plms, realism_test_bench.sh) on the execute-time-limited
    runtime."""
    model, params = setup
    params = jax.device_put(params, cpu_devices[0])
    batch = make_batch(b=4)
    rng = jax.random.PRNGKey(17)

    def run(**kw):
        fn = make_inpaint_pipeline(
            model, num_steps=4, guidance_scale=2.0, sampler="plms", **kw
        )
        return {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}

    ref = run()
    out = run(sample_segments=2)  # segment lengths 1 and 2 (+prologue)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"segmented plms {k} differs from monolithic",
        )

    # num_steps == segments: the prologue absorbs the whole first segment
    # (empty slice filtered), every remaining segment scans exactly 1 step
    out1 = run(sample_segments=4)
    for k in ref:
        np.testing.assert_allclose(
            out1[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"1-step-segmented plms {k} differs from monolithic",
        )


def test_segmented_plms_preflight(setup, cpu_devices):
    """preflight AOT-compiles BOTH plms segment shapes (the first segment
    is one step shorter) and the compiled executables reproduce the eager
    outputs."""
    model, params = setup
    params = jax.device_put(params, cpu_devices[0])
    batch = make_batch(b=2)
    rng = jax.random.PRNGKey(3)

    fn = make_inpaint_pipeline(
        model, num_steps=4, guidance_scale=2.0, sampler="plms",
        sample_segments=2,
    )
    before = {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}
    assert fn.preflight(params, batch, rng) is False  # CPU: no HBM budget
    assert sorted(fn._seg_c) == [1, 2]
    after = {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=0, atol=1e-6)


def test_segmented_plms_composes_with_mesh(setup, cpu_devices):
    """PLMS segments x dp mesh: the history ring's batch axis is axis 1, so
    it gets its own sharding constraint — a wrong spec here would silently
    all-gather (or worse, shard the ring axis of 3) between segments.
    Tolerance as test_segmented_composes_with_mesh (fp32 reassociation
    across program boundaries)."""
    model, params = setup
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(23)

    fn_ref = make_inpaint_pipeline(
        model, num_steps=4, guidance_scale=2.0, sampler="plms"
    )
    ref = fn_ref(jax.device_put(params, cpu_devices[0]), batch, rng)
    ref = {k: np.asarray(v) for k, v in ref.items()}

    mesh = inference_mesh(devices=cpu_devices)
    fn = make_inpaint_pipeline(
        model, num_steps=4, guidance_scale=2.0, sampler="plms", mesh=mesh,
        sample_segments=2,
    )
    out = fn(replicate_params(mesh, params), shard_batch(mesh, batch), rng)
    out = {k: np.asarray(v) for k, v in out.items()}

    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-3,
            err_msg=f"segmented+mesh plms {k} differs from single-device",
        )


def test_segmented_matches_monolithic_stochastic(setup, cpu_devices):
    """eta > 0: every DDIM step draws noise from the carried rng, so the
    (x, key) handoff across segment boundaries must reproduce the monolithic
    scan's key sequence exactly — a break here shows up as a different noise
    draw in segment 2+, not a numeric tolerance issue."""
    model, params = setup
    params = jax.device_put(params, cpu_devices[0])
    batch = make_batch(b=2)
    rng = jax.random.PRNGKey(11)

    def run(**kw):
        fn = make_inpaint_pipeline(
            model, num_steps=4, guidance_scale=2.0, sampler="ddim",
            eta=1.0, **kw
        )
        return {k: np.asarray(v) for k, v in fn(params, batch, rng).items()}

    ref = run()
    out = run(sample_segments=4)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-5,
            err_msg=f"stochastic segmented {k} differs from monolithic",
        )


def test_segmented_composes_with_mesh(setup, cpu_devices):
    """segments x dp mesh (the pod deployment shape: batch sharded over
    chips AND no single execute outliving a runtime limit): each segment is
    an SPMD program over the dp-sharded batch, step tables replicated,
    latents pinned to the batch sharding at segment boundaries (no silent
    all-gather between segments).

    Tolerance note: program-boundary placement changes XLA's fusion
    choices, and the DDIM update divides by sqrt(alpha_t) (~30x at early
    timesteps), amplifying ulp-level reassociation differences — measured
    ~2.3e-4 after 3 steps at this batch, IDENTICAL on a single device
    (seg3-vs-monolithic, no mesh), so it is segmentation-inherent fp32
    reassociation, not a sharding bug. Asserted at 1e-3, still ~8x below
    the 8-bit output quantization step (2/255)."""
    model, params = setup
    batch = make_batch(b=8)
    rng = jax.random.PRNGKey(21)

    ref = _run(model, jax.device_put(params, cpu_devices[0]), batch, rng)

    mesh = inference_mesh(devices=cpu_devices)
    fn = make_inpaint_pipeline(
        model, num_steps=3, guidance_scale=2.0, sampler="ddim", mesh=mesh,
        sample_segments=3,
    )
    assert fn.preflight(
        replicate_params(mesh, params), shard_batch(mesh, batch), rng
    ) is False
    out = fn(replicate_params(mesh, params), shard_batch(mesh, batch), rng)
    out = {k: np.asarray(v) for k, v in out.items()}

    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=0, atol=1e-3,
            err_msg=f"segmented+mesh {k} differs from single-device",
        )

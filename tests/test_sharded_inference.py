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

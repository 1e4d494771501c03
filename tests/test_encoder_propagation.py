"""Encoder-propagation fast sampling (UNet encoder_cache + ddim option)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_diffusion import TINY, make_batch, tiny_model_and_params


@pytest.fixture(scope="module")
def model_params():
    return tiny_model_and_params()


def test_unet_cache_exact_when_same_input(model_params):
    """Running with the cache produced from the SAME (x, t) must reproduce
    the full forward exactly — the cached path skips recomputing the
    encoder, nothing else."""
    model, params = model_params
    rng = np.random.default_rng(0)
    x9 = jnp.asarray(rng.normal(size=(2, 8, 8, 9)).astype(np.float32))
    t = jnp.asarray([3, 3], jnp.int32)
    ctx = jnp.asarray(rng.normal(size=(2, 2, TINY.context_dim)).astype(np.float32))

    eps_full, cache = model.apply_model(
        params, x9, t, ctx, return_cache=True
    )
    eps_cached = model.apply_model(params, x9, t, ctx, encoder_cache=cache)
    np.testing.assert_allclose(
        np.asarray(eps_full), np.asarray(eps_cached), atol=1e-6
    )


def test_unet_cache_decoder_sees_new_timestep(model_params):
    """With a stale cache, changing t must still change the output (the
    decoder consumes the current timestep embedding). Params must be
    perturbed off the zero-init point first — at init every output conv is
    zero and eps is t-independent by construction."""
    from tests.helpers import perturb_params

    model, params0 = model_params
    params = dict(params0)
    params["unet"] = perturb_params(params0["unet"])
    rng = np.random.default_rng(1)
    x9 = jnp.asarray(rng.normal(size=(2, 8, 8, 9)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 2, TINY.context_dim)).astype(np.float32))
    t1 = jnp.asarray([5, 5], jnp.int32)
    t2 = jnp.asarray([500, 500], jnp.int32)

    _, cache = model.apply_model(params, x9, t1, ctx, return_cache=True)
    a = model.apply_model(params, x9, t2, ctx, encoder_cache=cache)
    b = model.apply_model(params, x9, t1, ctx, encoder_cache=cache)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_ddim_encoder_interval_samples(model_params):
    """sample(..., encoder_interval=3) runs end-to-end and stays close to
    the exact DDIM result (encoder features drift slowly by design)."""
    model, params = model_params
    batch = make_batch(b=1)
    data = model.get_input(
        params, batch, jax.random.PRNGKey(0), encode_cond=True
    )
    exact = model.sample(
        params, data, jax.random.PRNGKey(1), num_steps=6,
        guidance_scale=5.0, sampler="ddim",
    )
    fast = model.sample(
        params, data, jax.random.PRNGKey(1), num_steps=6,
        guidance_scale=5.0, sampler="ddim", encoder_interval=3,
    )
    assert fast.shape == exact.shape
    assert np.isfinite(np.asarray(fast)).all()
    # same rng + zero-init adapters at init -> outputs in the same ballpark;
    # this is an approximation, so only require correlation, not equality
    a, b = np.asarray(exact).ravel(), np.asarray(fast).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.5, f"encoder-propagation diverged (corr={corr:.3f})"


def test_ddim_encoder_interval2_divergence_band(model_params):
    """Pin the interval-2 divergence: small but nonzero.

    Companion to the flagship-scale sweep in PROFILE.md ("Encoder
    propagation accuracy", scripts/encoder_prop_accuracy.py). Interval 2
    is the recommended safe setting; this regression guards both
    directions — a rel-MSE above the band means caching broke accuracy,
    (near-)zero means the interval knob stopped doing anything (e.g. the
    cache silently recomputes every step)."""
    from tests.helpers import perturb_params

    model, params0 = model_params
    params = dict(params0)
    params["unet"] = perturb_params(params0["unet"])
    batch = make_batch(b=1)
    data = model.get_input(
        params, batch, jax.random.PRNGKey(0), encode_cond=True
    )
    exact = model.sample(
        params, data, jax.random.PRNGKey(1), num_steps=10,
        guidance_scale=5.0, sampler="ddim",
    )
    fast = model.sample(
        params, data, jax.random.PRNGKey(1), num_steps=10,
        guidance_scale=5.0, sampler="ddim", encoder_interval=2,
    )
    a, b = np.asarray(exact, np.float64), np.asarray(fast, np.float64)
    rel = float(((b - a) ** 2).sum() / (a**2).sum())
    assert 1e-8 < rel < 0.15, f"interval-2 rel-MSE {rel:.2e} out of band"

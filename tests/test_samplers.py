"""Sampler correctness against a closed-form denoiser.

For a model that predicts eps perfectly for data x0 (eps_hat = (x_t -
sqrt(a_t) x0)/sqrt(1-a_t)), a DDIM step maps x_t exactly to sqrt(a_prev) x0 +
sqrt(1-a_prev) * eps_implied, so the final sample must converge to x0. This
validates the scanned loops against the DDIM recurrence (reference
ddim.py:195-213) without any network.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.models.samplers import ddim_sample, plms_sample
from mobi_tpu.ops.schedules import DiffusionSchedule, SamplerTables

SCHED = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)


def oracle_model(x0):
    """eps-oracle: derives the true eps from (x_t, t)."""

    def model_fn(x9, t, ctx):
        x = x9[..., :4]
        a_t = SCHED.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)

    return model_fn


def oracle_final(x0, x_T, tables):
    """Closed-form final latent for the eps-oracle.

    Under the exact-eps DDIM recurrence the trajectory stays on
    x_t = sqrt(a_t) x0 + sqrt(1-a_t) e with the SAME implied noise direction
    e = (x_T - sqrt(a_T) x0)/sqrt(1-a_T), so the final sample is
    sqrt(a_last_prev) x0 + sqrt(1-a_last_prev) e — the sqrt(1-a_0)~0.03
    residual of e never vanishes (same in the reference, ddim.py:195-213)."""
    a_T = np.float64(tables.alphas[0])
    a_end = np.float64(tables.alphas_prev[-1])
    e = (np.asarray(x_T, np.float64) - np.sqrt(a_T) * np.asarray(x0, np.float64)) / np.sqrt(
        1.0 - a_T
    )
    return np.sqrt(a_end) * np.asarray(x0, np.float64) + np.sqrt(1.0 - a_end) * e


def test_ddim_oracle_recovers_x0():
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 4)) * 0.5
    tables = SamplerTables.create(SCHED, 50)
    x_T = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    rest = jnp.zeros((2, 8, 8, 5))
    cond = jnp.zeros((2, 2, 16))
    out = ddim_sample(
        oracle_model(x0), tables, jax.random.PRNGKey(2), x_T, cond, rest
    )
    expected = oracle_final(x0, x_T, tables)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)
    # and the residual itself is small: the sample is close to x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.2)


def test_plms_oracle_recovers_x0():
    """For the eps-oracle the implied eps is constant along the trajectory, so
    the Adams-Bashforth blend is exact and PLMS lands on the same closed form
    (the Euler prologue's second eval sits exactly at (x_prev, t_next))."""
    rng = jax.random.PRNGKey(3)
    x0 = jax.random.normal(rng, (2, 8, 8, 4)) * 0.5
    tables = SamplerTables.create(SCHED, 50)
    x_T = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    rest = jnp.zeros((2, 8, 8, 5))
    cond = jnp.zeros((2, 2, 16))
    out = plms_sample(oracle_model(x0), tables, x_T, cond, rest)
    expected = oracle_final(x0, x_T, tables)
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)


def test_ddpm_ancestral_sampling_converges_to_x0():
    """Full 1000-step ancestral loop (reference ddpm.py:253-282) with the
    eps-oracle: the posterior contracts toward x0 with small residual
    stochastic noise."""
    from mobi_tpu.models.samplers import ddpm_sample

    sched = DiffusionSchedule.create(200, "linear", 0.00085, 0.0120)

    def model_fn(x9, t, ctx):
        x = x9[..., :4]
        a_t = sched.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a_t) * X0) / jnp.sqrt(1.0 - a_t)

    X0 = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 4)) * 0.4
    x_T = jax.random.normal(jax.random.PRNGKey(11), X0.shape)
    rest = jnp.zeros((2, 8, 8, 5))
    cond = jnp.zeros((2, 2, 16))
    out = ddpm_sample(
        model_fn, sched, jax.random.PRNGKey(12), x_T, cond, rest,
        clip_denoised=True,
    )
    err = float(jnp.abs(out - X0).mean())
    init_err = float(jnp.abs(x_T - X0).mean())
    assert err < 0.15 * init_err, f"ancestral sample err {err} vs {init_err}"
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_single_step_matches_reference_formula():
    """One step, by hand (ddim.py:195-212)."""
    x0 = jnp.full((1, 2, 2, 4), 0.3)
    tables = SamplerTables.create(SCHED, 1)
    x_T = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    rest = jnp.zeros((1, 2, 2, 5))
    cond = jnp.zeros((1, 1, 8))
    model_fn = oracle_model(x0)
    out = ddim_sample(model_fn, tables, jax.random.PRNGKey(6), x_T, cond, rest)
    a_t = float(tables.alphas[0])
    a_prev = float(tables.alphas_prev[0])
    eps = np.asarray(
        model_fn(
            jnp.concatenate([x_T, rest], -1),
            jnp.full((1,), tables.timesteps[0]), cond,
        )
    )
    pred_x0 = (np.asarray(x_T) - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_cfg_batch_doubling_math():
    """guided eps == uncond + s*(cond - uncond) (ddim.py:177-184)."""
    from mobi_tpu.models.samplers import _guided_eps

    def model_fn(x9, t, ctx):
        # eps depends linearly on the context token sum
        return jnp.ones_like(x9[..., :4]) * ctx.sum(axis=(1, 2))[:, None, None, None]

    x = jnp.zeros((2, 4, 4, 9))
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.ones((2, 1, 4))           # sum 4 -> eps 4
    uncond = jnp.zeros((2, 1, 4))        # sum 0 -> eps 0
    out = _guided_eps(model_fn, x, t, cond, uncond, scale=5.0)
    np.testing.assert_allclose(np.asarray(out), 20.0)  # 0 + 5*(4-0)
    out1 = _guided_eps(model_fn, x, t, cond, uncond, scale=1.0)
    np.testing.assert_allclose(np.asarray(out1), 4.0)


def test_plms_trace_structure():
    """PLMS must trace the model exactly 3 times: twice in the
    pseudo-improved-Euler prologue (plms.py:221-226) and once in the scanned
    multistep body — i.e. the S-1 remaining steps share ONE compiled body."""
    calls = []

    def counting_model(x9, t, ctx):
        calls.append(1)
        return jnp.zeros_like(x9[..., :4])

    tables = SamplerTables.create(SCHED, 5)
    x_T = jnp.zeros((1, 2, 2, 4))
    rest = jnp.zeros((1, 2, 2, 5))
    cond = jnp.zeros((1, 1, 8))
    plms_sample(counting_model, tables, x_T, cond, rest)
    assert len(calls) == 3


def test_plms_constant_eps_equals_ddim():
    """With a constant-eps model the AB blend is a no-op, so PLMS must track
    the plain DDIM recurrence step for step."""

    def const_model(x9, t, ctx):
        return jnp.full_like(x9[..., :4], 0.37)

    tables = SamplerTables.create(SCHED, 10)
    x_T = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 4, 4))
    rest = jnp.zeros((1, 4, 4, 5))
    cond = jnp.zeros((1, 1, 8))
    out_plms = plms_sample(const_model, tables, x_T, cond, rest)
    out_ddim = ddim_sample(
        const_model, tables, jax.random.PRNGKey(8), x_T, cond, rest
    )
    np.testing.assert_allclose(
        np.asarray(out_plms), np.asarray(out_ddim), atol=1e-5
    )

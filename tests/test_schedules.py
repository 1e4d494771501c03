import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.ops import (
    DiffusionSchedule,
    SamplerTables,
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_plms_coeffs,
    timestep_embedding,
)

# MObI config values (configs/mobi_nusc_512.yaml:32-36).
LINEAR_START, LINEAR_END, T = 0.00085, 0.0120, 1000


def test_linear_beta_schedule_endpoints():
    betas = make_beta_schedule("linear", T, LINEAR_START, LINEAR_END)
    assert betas.dtype == np.float64
    assert betas.shape == (T,)
    np.testing.assert_allclose(betas[0], LINEAR_START, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], LINEAR_END, rtol=1e-12)
    # sqrt-space linearity: sqrt(betas) is affine in index
    s = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(s), np.diff(s)[0], rtol=1e-8)


def test_cosine_schedule_bounds():
    betas = make_beta_schedule("cosine", 100)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)


def test_schedule_buffers_consistent():
    sched = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev)[1:], ac[:-1], rtol=1e-6
    )
    assert float(sched.alphas_cumprod_prev[0]) == 1.0
    # lvlb_weights[0] replaced by [1] (ddpm.py:177)
    assert float(sched.lvlb_weights[0]) == float(sched.lvlb_weights[1])
    assert np.all(np.isfinite(np.asarray(sched.lvlb_weights)))


def test_q_sample_interpolates():
    sched = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    x0 = jnp.ones((2, 4, 8, 8))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    out = sched.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        out[0], float(sched.sqrt_alphas_cumprod[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        out[1], float(sched.sqrt_alphas_cumprod[999]), rtol=1e-6
    )


def test_ddim_timesteps_uniform_50():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981  # +1 offset (util.py:57)
    assert np.all(np.diff(ts) == 20)


def test_ddim_params_eta0():
    sched = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, 0.0)
    assert np.all(sigmas == 0)
    np.testing.assert_allclose(alphas, ac[ts])
    assert alphas_prev[0] == ac[0]
    np.testing.assert_allclose(alphas_prev[1:], ac[ts[:-1]])


def test_sampler_tables_order():
    sched = DiffusionSchedule.create(T, "linear", LINEAR_START, LINEAR_END)
    tab = SamplerTables.create(sched, 50)
    ts = np.asarray(tab.timesteps)
    assert ts[0] == 981 and ts[-1] == 1  # sampling order: large t first
    assert np.asarray(tab.timesteps_next)[0] == 961
    assert np.asarray(tab.timesteps_next)[-1] == 1
    # alphas in sampling order are increasing in alpha_cumprod terms? No:
    # early sampling steps have small alpha_cumprod (more noise).
    alphas = np.asarray(tab.alphas)
    assert alphas[0] < alphas[-1]
    assert tab.plms_coeffs.shape == (49, 4)


def test_plms_coeffs_match_reference_orders():
    c = make_plms_coeffs(50)
    # step 1: (3e - e_prev)/2
    np.testing.assert_allclose(c[0], [1.5, -0.5, 0, 0])
    # step 2: (23e -16 +5)/12
    np.testing.assert_allclose(c[1], np.array([23, -16, 5, 0]) / 12)
    # steps >=3: (55 -59 +37 -9)/24
    np.testing.assert_allclose(c[2], np.array([55, -59, 37, -9]) / 24)
    np.testing.assert_allclose(c[-1], np.array([55, -59, 37, -9]) / 24)
    # All rows sum to 1 (consistency of AB methods)
    np.testing.assert_allclose(c.sum(-1), 1.0, rtol=1e-12)


def test_timestep_embedding_matches_formula():
    import math

    dim = 320
    t = jnp.array([0.0, 1.0, 500.0])
    emb = timestep_embedding(t, dim)
    assert emb.shape == (3, dim)
    half = dim // 2
    # reference computes in float32 (util.py:162-166); compare in float32 —
    # large phases like cos(500.0) are senstive to argument precision.
    freqs = np.exp(
        (-math.log(10000) * np.arange(half, dtype=np.float32) / half).astype(
            np.float32
        )
    ).astype(np.float32)
    args = np.asarray(t, dtype=np.float32)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # tiny float32 freq differences (jnp.exp vs np.exp) are amplified by the
    # t=500 phase; 2e-3 on unit-scale sinusoids is float32-trig noise.
    np.testing.assert_allclose(np.asarray(emb), ref, atol=2e-3)

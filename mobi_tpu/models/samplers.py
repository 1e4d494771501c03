"""DDIM and PLMS samplers as single `lax.scan` loops.

Reference behavior: /root/reference/ldm/models/diffusion/ddim.py:114-213 and
plms.py:115-239. TPU-first re-design:

  * the per-step (t, a_t, a_prev, sqrt(1-a_t), sigma) values are pre-stacked
    host-side into `SamplerTables` and scanned over — no host sync, no
    data-dependent indexing;
  * classifier-free guidance doubles the batch inside the scanned step
    (uncond first, cond second, matching ddim.py:180-184);
  * the 5 conditioning channels (4 inpaint latent + 1 mask) are re-concatenated
    to the noisy 4-channel state every step (ddim.py:170-176);
  * PLMS's multistep history is a fixed [3, ...] ring carried through the scan,
    blended with a precomputed Adams-Bashforth coefficient table
    (plms.py:221-235); step 0's pseudo-improved-Euler double evaluation is an
    unrolled prologue.

`model_fn(x9, t, context) -> eps4` is the jittable denoiser (UNet apply with
bound params); callers jit the whole sampler.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mobi_tpu.ops.schedules import SamplerTables

Array = jnp.ndarray
ModelFn = Callable[[Array, Array, Array], Array]


def _guided_eps(
    model_fn: ModelFn,
    x9: Array,
    t: Array,
    cond: Array,
    uncond: Optional[Array],
    scale: float,
) -> Array:
    if uncond is None or scale == 1.0:
        return model_fn(x9, t, cond)
    x_in = jnp.concatenate([x9, x9], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = jnp.concatenate([uncond, cond], axis=0)
    eps_all = model_fn(x_in, t_in, c_in)
    eps_uncond, eps_cond = jnp.split(eps_all, 2, axis=0)
    return eps_uncond + scale * (eps_cond - eps_uncond)


def _ddim_update(x: Array, eps: Array, a_t, a_prev, sqrt_1m_at, sigma, noise):
    """x_{t-1} from eps prediction (ddim.py:200-212)."""
    pred_x0 = (x - sqrt_1m_at * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise, pred_x0


def ddim_scan_segment(
    model_fn: ModelFn,
    rng: jax.Array,
    x: Array,
    cond: Array,
    rest: Array,
    per_step,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
    temperature: float = 1.0,
    eta_is_zero: bool = True,
):
    """A contiguous run of DDIM steps as one `lax.scan`.

    `per_step` is the (t, alpha, alpha_prev, sqrt(1-alpha), sigma) arrays for
    the steps to run — sliced from `SamplerTables` sampling order. They are
    ordinary operands (not closed-over constants), so ONE jitted segment
    executable serves every slice of the trajectory: pipeline.py dispatches
    the 50-step loop as several identical programs when a single execute
    would exceed the runtime's per-program limit (PROFILE.md "device fault
    ... execute-time limit"). Returns (x, rng) to carry into the next
    segment; running one segment over the full tables IS the classic DDIM
    loop (ddim.py:114-213) and `ddim_sample` below is defined that way.
    """

    def draw_noise(x, key):
        if eta_is_zero:
            return jnp.zeros_like(x), key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, x.shape, dtype=x.dtype) * temperature, key

    def step(carry, ps):
        x, key = carry
        t, a_t, a_prev, sqrt_1m_at, sigma = ps
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = _guided_eps(model_fn, x9, tb, cond, uncond, guidance_scale)
        noise, key = draw_noise(x, key)
        x, _ = _ddim_update(x, eps, a_t, a_prev, sqrt_1m_at, sigma, noise)
        return (x, key), None

    (x, rng), _ = jax.lax.scan(step, (x, rng), per_step)
    return x, rng


def ddim_sample(
    model_fn: ModelFn,
    tables: SamplerTables,
    rng: jax.Array,
    x_T: Array,
    cond: Array,
    rest: Array,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
    temperature: float = 1.0,
    encoder_interval: int = 1,
    cached_model_fn: Optional[Callable] = None,
) -> Array:
    """DDIM sampling loop.

    Args:
      x_T: [B, h, w, 4] initial noise.
      cond: [B, n_tokens, D] conditioning tokens.
      rest: [B, h, w, 5] the static conditioning channels.
      uncond: unconditional tokens for CFG.
      encoder_interval: > 1 enables encoder propagation ("Faster Diffusion",
        arXiv 2312.09608): the UNet encoder+middle run only every
        `encoder_interval`-th step; other steps reuse the cached skip
        activations and pay only for the decoder. Requires
        `cached_model_fn(x9, t, ctx, cache, return_cache)`; approximate —
        off (1) by default to keep reference DDIM semantics.

    Returns the final denoised latent [B, h, w, 4].
    """
    eta_zero = tables.eta_is_zero

    def draw_noise(x, key):
        if eta_zero:
            return jnp.zeros_like(x), key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, x.shape, dtype=x.dtype) * temperature, key

    per_step = (
        tables.timesteps,
        tables.alphas,
        tables.alphas_prev,
        tables.sqrt_one_minus_alphas,
        tables.sigmas,
    )

    if encoder_interval <= 1 or cached_model_fn is None:
        x, _ = ddim_scan_segment(
            model_fn, rng, x_T, cond, rest, per_step, uncond,
            guidance_scale, temperature, eta_zero,
        )
        return x

    # --- encoder-propagation variant -------------------------------------
    def batched(x, t):
        """CFG input assembly shared by both branches."""
        if uncond is None or guidance_scale == 1.0:
            return x, jnp.full((x.shape[0],), t, jnp.int32), cond
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((x_in.shape[0],), t, jnp.int32)
        c_in = jnp.concatenate([uncond, cond], axis=0)
        return x_in, t_in, c_in

    def guided(eps_all):
        if uncond is None or guidance_scale == 1.0:
            return eps_all
        eps_u, eps_c = jnp.split(eps_all, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)

    n = int(tables.timesteps.shape[0])
    is_key = (jnp.arange(n) % encoder_interval) == 0

    # prologue: step 0 runs full and materializes the cache for the carry
    t0 = tables.timesteps[0]
    x9 = jnp.concatenate([x_T, rest], axis=-1)
    x_in, t_in, c_in = batched(x9, t0)
    eps_all, cache = cached_model_fn(x_in, t_in, c_in, None, True)
    noise, key = draw_noise(x_T, rng)
    x, _ = _ddim_update(
        x_T, guided(eps_all), tables.alphas[0], tables.alphas_prev[0],
        tables.sqrt_one_minus_alphas[0], tables.sigmas[0], noise,
    )

    def step(carry, ps):
        x, key, cache = carry
        (t, a_t, a_prev, sqrt_1m_at, sigma), key_step = ps
        x9 = jnp.concatenate([x, rest], axis=-1)
        x_in, t_in, c_in = batched(x9, t)

        def full(_):
            return cached_model_fn(x_in, t_in, c_in, None, True)

        def reuse(_):
            return cached_model_fn(x_in, t_in, c_in, cache, False), cache

        eps_all, cache_new = jax.lax.cond(key_step, full, reuse, None)
        noise, key = draw_noise(x, key)
        x, _ = _ddim_update(
            x, guided(eps_all), a_t, a_prev, sqrt_1m_at, sigma, noise
        )
        return (x, key, cache_new), None

    tail = jax.tree.map(lambda a: a[1:], per_step)
    (x, _, _), _ = jax.lax.scan(step, (x, key, cache), (tail, is_key[1:]))
    return x


def ddpm_sample(
    model_fn: ModelFn,
    schedule,
    rng: jax.Array,
    x_T: Array,
    cond: Array,
    rest: Array,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
    clip_denoised: bool = True,
) -> Array:
    """Full-length ancestral DDPM sampling as one scan over all T steps
    (reference ddpm.py:253-282 p_sample/p_sample_loop with the q-posterior
    of ddpm.py:227-251): eps -> x0 estimate (optionally clipped) -> posterior
    mean + sigma_t * noise (no noise at t == 0)."""

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = _guided_eps(model_fn, x9, tb, cond, uncond, guidance_scale)
        x_recon = (
            schedule.sqrt_recip_alphas_cumprod[t] * x
            - schedule.sqrt_recipm1_alphas_cumprod[t] * eps
        )
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (
            schedule.posterior_mean_coef1[t] * x_recon
            + schedule.posterior_mean_coef2[t] * x
        )
        logvar = schedule.posterior_log_variance_clipped[t]
        noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        return (x, key), None

    ts = jnp.arange(schedule.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(step, (x_T, rng), ts)
    return x


def ddim_stochastic_encode(
    tables: SamplerTables,
    x0: Array,
    t_index: Array,
    noise: Array,
) -> Array:
    """Noise x0 to the t_index-th DDIM step (reference ddim.py:215-229).

    `t_index` indexes the INCREASING-t DDIM table (0 = least noisy), like the
    reference's `t` argument."""
    # tables are stored in sampling order (largest t first) — flip
    alphas = tables.alphas[::-1]
    sqrt_om = tables.sqrt_one_minus_alphas[::-1]
    shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
    a = jnp.sqrt(alphas[t_index]).reshape(shape)
    s = sqrt_om[t_index].reshape(shape)
    return a * x0 + s * noise


def ddim_decode(
    model_fn: ModelFn,
    tables: SamplerTables,
    x_latent: Array,
    t_start: int,
    cond: Array,
    rest: Array,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
) -> Array:
    """Deterministic DDIM decode of a stochastically-encoded latent: runs the
    FIRST t_start timesteps of the increasing-t DDIM table, largest first —
    i.e. the last t_start entries of the sampling-order tables
    (reference ddim.py:231-250). `t_start` is static."""
    s = tables.num_steps
    assert 0 < t_start <= s, f"t_start {t_start} out of range 1..{s}"
    sl = slice(s - t_start, s)

    def step(x, per_step):
        t, a_t, a_prev, sqrt_1m_at = per_step
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = _guided_eps(model_fn, x9, tb, cond, uncond, guidance_scale)
        x, _ = _ddim_update(x, eps, a_t, a_prev, sqrt_1m_at, 0.0, 0.0)
        return x, None

    per_step = (
        tables.timesteps[sl],
        tables.alphas[sl],
        tables.alphas_prev[sl],
        tables.sqrt_one_minus_alphas[sl],
    )
    x, _ = jax.lax.scan(step, x_latent, per_step)
    return x


def plms_prologue(
    model_fn: ModelFn,
    tables: SamplerTables,
    x_T: Array,
    cond: Array,
    rest: Array,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
):
    """PLMS step 0, pseudo improved Euler (plms.py:221-226): eps at t0,
    provisional DDIM update, second eps at t1, average. Returns (x after
    step 0, eps history ring [3, ...]) — the carry `plms_scan_segment`
    continues from."""

    def eval_eps(x, t_scalar):
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        return _guided_eps(model_fn, x9, tb, cond, uncond, guidance_scale)

    def update(x, eps):
        return _ddim_update(
            x, eps, tables.alphas[0], tables.alphas_prev[0],
            tables.sqrt_one_minus_alphas[0], 0.0, 0.0,
        )[0]

    e_t = eval_eps(x_T, tables.timesteps[0])
    x_prev = update(x_T, e_t)
    e_t_next = eval_eps(x_prev, tables.timesteps_next[0])
    e_prime = 0.5 * (e_t + e_t_next)
    x = update(x_T, e_prime)
    hist = jnp.stack([e_t, jnp.zeros_like(e_t), jnp.zeros_like(e_t)])
    return x, hist


def plms_scan_segment(
    model_fn: ModelFn,
    x: Array,
    hist: Array,
    cond: Array,
    rest: Array,
    per_step,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
):
    """A contiguous run of PLMS multistep updates (steps >= 1) as one
    `lax.scan`: Adams-Bashforth blend of the current eps with up to 3
    history entries via the precomputed coefficient table (plms.py:227-237).

    `per_step` is (t, alpha, alpha_prev, sqrt(1-alpha), coeffs) for the
    steps to run — tables rows 1..S-1 (row 0 is `plms_prologue`), sliced.
    Like `ddim_scan_segment`, the tables are operands, so one jitted
    executable serves every equal-length slice of the trajectory; the
    multistep state is an explicit (x, hist) carry, so the trajectory can
    be split across device programs at any step boundary (pipeline.py uses
    this to stay under the runtime's per-execute time limit). Running one
    segment over rows 1..S-1 IS the classic PLMS loop and `plms_sample` is
    defined that way. Returns (x, hist) to carry into the next segment.
    """

    def step(carry, ps):
        x, hist = carry
        t, a_t, a_prev, sqrt_1m_at, coeffs = ps
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = _guided_eps(model_fn, x9, tb, cond, uncond, guidance_scale)
        e_prime = (
            coeffs[0] * eps
            + coeffs[1] * hist[0]
            + coeffs[2] * hist[1]
            + coeffs[3] * hist[2]
        )
        x, _ = _ddim_update(x, e_prime, a_t, a_prev, sqrt_1m_at, 0.0, 0.0)
        hist = jnp.stack([eps, hist[0], hist[1]])
        return (x, hist), None

    (x, hist), _ = jax.lax.scan(step, (x, hist), per_step)
    return x, hist


def plms_per_step_tables(tables: SamplerTables):
    """The (t, alpha, alpha_prev, sqrt(1-alpha), coeffs) stack for PLMS
    steps 1..S-1, scan/slice-ready (row i drives step i+1)."""
    return (
        tables.timesteps[1:],
        tables.alphas[1:],
        tables.alphas_prev[1:],
        tables.sqrt_one_minus_alphas[1:],
        tables.plms_coeffs,
    )


def plms_sample(
    model_fn: ModelFn,
    tables: SamplerTables,
    x_T: Array,
    cond: Array,
    rest: Array,
    uncond: Optional[Array] = None,
    guidance_scale: float = 1.0,
) -> Array:
    """PLMS (pseudo linear multistep) sampling loop; eta is always 0.

    `plms_prologue` (step 0) + one `plms_scan_segment` over steps 1..S-1.
    """
    x, hist = plms_prologue(
        model_fn, tables, x_T, cond, rest, uncond, guidance_scale
    )
    x, _ = plms_scan_segment(
        model_fn, x, hist, cond, rest, plms_per_step_tables(tables),
        uncond, guidance_scale,
    )
    return x

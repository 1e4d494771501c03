"""Diffusion noise schedules and sampler step tables.

All schedule math is done host-side in float64 numpy and frozen into jnp
arrays; the sampling loop then consumes pre-stacked per-step tables inside a
single `lax.scan`, so there is never a host sync or data-dependent indexing in
the compiled program.

Behavioral contract follows the reference implementation
(/root/reference/ldm/modules/diffusionmodules/util.py:21-75 for schedule
construction, /root/reference/ldm/models/diffusion/ddpm.py:127-179 for the
DDPM buffer set, ddim.py:25-54 and plms.py:199-237 for sampler parameters).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule in float64 (reference util.py:21-43)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM timestep subset (reference util.py:46-60); +1 offset included."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.arange(0, num_ddpm_timesteps, c)
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(
            f'unknown ddim discretization method "{ddim_discr_method}"'
        )
    # DELIBERATE DEVIATION from the reference for non-divisor step counts:
    # the +1 offset can push the last index to num_ddpm_timesteps when
    # num_ddim_timesteps does not divide num_ddpm_timesteps (e.g. 3 into
    # 1000 -> [1, 334, 667, 1000]), where the reference would index its
    # schedule buffers out of range (util.py:57, alphacums[1000] raises).
    # We clamp the last step to num_ddpm_timesteps - 1 so any step count
    # works; for divisor counts (the reference's only runnable configs,
    # incl. the published 50/200-step settings) the grids are identical.
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """(sigmas, alphas, alphas_prev) per DDIM step (reference util.py:63-74)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def make_plms_coeffs(num_steps: int) -> np.ndarray:
    """Adams-Bashforth blending coefficients for every PLMS step.

    Row i gives (c_cur, c_1, c_2, c_3) so that
        eps' = c_cur*eps_t + c_1*old[-1] + c_2*old[-2] + c_3*old[-3]
    matching the per-history-length orders of reference plms.py:221-235.
    Step 0 is special (pseudo improved Euler needs a second model eval) and is
    NOT covered by this table; row 0 here corresponds to sampling step 1.
    """
    rows = []
    for i in range(1, num_steps):
        n_old = min(i, 3)
        if n_old == 1:
            rows.append((3 / 2, -1 / 2, 0.0, 0.0))
        elif n_old == 2:
            rows.append((23 / 12, -16 / 12, 5 / 12, 0.0))
        else:
            rows.append((55 / 24, -59 / 24, 37 / 24, -9 / 24))
    return np.asarray(rows, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All DDPM buffers as device arrays (reference ddpm.py:127-179)."""

    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    log_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    lvlb_weights: Array
    num_timesteps: int
    linear_start: float
    linear_end: float

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: Optional[np.ndarray] = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        if given_betas is not None:
            betas = np.asarray(given_betas, dtype=np.float64)
        else:
            betas = make_beta_schedule(
                beta_schedule, timesteps, linear_start=linear_start,
                linear_end=linear_end, cosine_s=cosine_s,
            )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas

        if parameterization == "eps":
            # posterior_variance[0] == 0; the resulting inf at index 0 is
            # replaced below (reference ddpm.py:177)
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
        elif parameterization == "x0":
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        else:
            raise NotImplementedError(parameterization)
        lvlb_weights = lvlb_weights.copy()
        lvlb_weights[0] = lvlb_weights[1]

        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            betas=f(betas),
            alphas_cumprod=f(alphas_cumprod),
            alphas_cumprod_prev=f(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f(posterior_variance),
            posterior_log_variance_clipped=f(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=f(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            lvlb_weights=f(lvlb_weights),
            num_timesteps=int(timesteps),
            linear_start=linear_start,
            linear_end=linear_end,
        )

    def q_sample(self, x_start: Array, t: Array, noise: Array) -> Array:
        """Forward-noise x_start to step t (reference ddpm.py:284-287)."""
        shape = (t.shape[0],) + (1,) * (x_start.ndim - 1)
        a = self.sqrt_alphas_cumprod[t].reshape(shape)
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
        return a * x_start + s * noise


@dataclasses.dataclass(frozen=True)
class SamplerTables:
    """Per-step tables for a scanned DDIM/PLMS loop, in sampling order.

    Index 0 is the FIRST sampling step (largest t). Shapes are [S] except
    plms_coeffs which is [S-1, 4] (step 0 handled by the Euler prologue).
    """

    timesteps: Array           # int32 [S] — t fed to the model at each step
    timesteps_next: Array      # int32 [S] — t of the following step (PLMS Euler)
    alphas: Array              # a_t per step
    alphas_prev: Array         # a_{t-1} per step
    sqrt_one_minus_alphas: Array
    sigmas: Array
    plms_coeffs: Array
    num_steps: int
    eta_is_zero: bool = True

    @classmethod
    def create(
        cls,
        schedule: DiffusionSchedule,
        num_steps: int,
        discretize: str = "uniform",
        eta: float = 0.0,
        dtype=jnp.float32,
    ) -> "SamplerTables":
        ddim_ts = make_ddim_timesteps(discretize, num_steps, schedule.num_timesteps)
        alphacums = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            alphacums, ddim_ts, eta
        )
        # Reverse into sampling order (largest timestep first).
        order = slice(None, None, -1)
        ts = ddim_ts[order].copy()
        # t_next for step i is the timestep of step i+1 (clamped at the end),
        # mirroring plms.py:146.
        ts_next = np.concatenate([ts[1:], ts[-1:]])
        f = lambda x: jnp.asarray(np.ascontiguousarray(x), dtype=dtype)
        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            timesteps_next=jnp.asarray(ts_next, dtype=jnp.int32),
            alphas=f(alphas[order]),
            alphas_prev=f(alphas_prev[order]),
            sqrt_one_minus_alphas=f(np.sqrt(1.0 - alphas)[order]),
            sigmas=f(sigmas[order]),
            plms_coeffs=f(make_plms_coeffs(len(ddim_ts))),
            num_steps=len(ddim_ts),
            eta_is_zero=(eta == 0.0),
        )


def timestep_embedding(timesteps: Array, dim: int, max_period: int = 10000) -> Array:
    """Sinusoidal timestep embedding, cos-then-sin ordering
    (reference diffusionmodules/util.py:151-171)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb

"""Range-view value normalizations (depth and intensity).

Vectorized, branch-free counterparts of the reference's piecewise
object-adaptive depth normalization (/root/reference/ldm/data/utils.py:536-580)
and the log intensity normalization implied by its inverse at
/root/reference/ldm/models/diffusion/ddpm.py:1540-1543.

These run both on host (numpy inputs) and on device (jnp inputs) — they only
use ufuncs shared by both APIs.
"""
from __future__ import annotations

import jax.numpy as jnp


def _xp(x):
    import numpy as np

    return jnp if isinstance(x, jnp.ndarray) else np


def depth_normalization(depth, min_d, max_d, alpha: float = 0.75):
    """Piecewise-linear stretch: [min_d, max_d] -> [-alpha, alpha].

    Values in [-1, min_d) map to [-1, -alpha), values in (max_d, 1] map to
    (alpha, 1]. min_d/max_d may be scalars or broadcastable arrays (per-object
    depth windows).
    """
    xp = _xp(depth)
    mid = -alpha + 2 * alpha * (depth - min_d) / (max_d - min_d)
    low = -1 + -(alpha - 1) * (depth + 1) / (min_d + 1)
    high = alpha + (1 - alpha) * (depth - max_d) / (1 - max_d)
    out = xp.where(depth < min_d, low, xp.where(depth > max_d, high, mid))
    return out


def inverse_depth_normalization(norm, min_d, max_d, alpha: float = 0.75):
    """Inverse of :func:`depth_normalization`."""
    xp = _xp(norm)
    mid = min_d + (norm + alpha) * (max_d - min_d) / (2 * alpha)
    low = -1 + -(norm + 1) * (min_d + 1) / (alpha - 1)
    high = max_d + (norm - alpha) * (1 - max_d) / (1 - alpha)
    out = xp.where(norm < -alpha, low, xp.where(norm > alpha, high, mid))
    return out


def intensity_normalization(x):
    """Intensity in [-1,1] -> log-stretched [-1,1]: y = 1 - 2*exp(-2*(x+1)).

    Chosen as the exact inverse of the reference's de-normalization
    (ddpm.py:1541): x = clip(-0.5*log(1-(y+1)/2) - 1, -1, 1).
    """
    xp = _xp(x)
    return 1.0 - 2.0 * xp.exp(-2.0 * (x + 1.0))


def inverse_intensity_normalization(y):
    xp = _xp(y)
    arg = xp.clip(1.0 - (y + 1.0) / 2.0, 1e-12, None)
    return xp.clip(-0.5 * xp.log(arg) - 1.0, -1.0, 1.0)

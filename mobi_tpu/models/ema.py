"""Exponential moving average of parameters.

Functional counterpart of the reference `LitEma`
(/root/reference/ldm/modules/ema.py:5-76): decay warms up as
min(decay, (1+n)/(10+n)) where n counts updates. State is a pytree the same
shape as params plus a step counter — pjit-shardable like the params
themselves.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    ema_params: Any
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params: Any) -> EmaState:
    return EmaState(
        ema_params=jax.tree_util.tree_map(jnp.asarray, params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EmaState, params: Any, decay: float = 0.9999) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)),
        state.ema_params,
        params,
    )
    return EmaState(ema_params=new_ema, num_updates=n)

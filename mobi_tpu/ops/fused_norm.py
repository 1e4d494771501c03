"""Fused GroupNorm + SiLU Pallas kernel for the UNet ResBlock path.

The reference computes `conv(silu(groupnorm(x)))` as separate torch ops
(openaimodel.py:163-275 via GroupNorm32 + SiLU). Under XLA the elementwise
chain fuses, but the group statistics force an fp32 round trip over the
activation; this kernel does stats + normalize + affine + SiLU in ONE pass
through VMEM per batch row, reading/writing the activation dtype (bf16).

Opt-in via the ResBlock `fused_gn` flag / MOBI_FUSED_GN=1 — A/B'd on the
v5e before becoming a default (see PROFILE.md).

Backward: custom VJP recomputes with the pure-jax reference formula (the
kernel is inference-motivated; training keeps full fidelity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray


def _gn_silu_reference(x: Array, scale: Array, bias: Array,
                       num_groups: int, eps: float) -> Array:
    """Pure-jax GroupNorm(fp32 stats) + SiLU — mirrors layers.GroupNorm."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    b = xf.shape[0]
    spatial = xf.shape[1:-1]
    c = xf.shape[-1]
    g = min(num_groups, c)
    xg = xf.reshape(b, *spatial, g, c // g)
    red = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axis=red, keepdims=True)
    var = xg.var(axis=red, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(b, *spatial, c) * scale + bias
    y = y * jax.nn.sigmoid(y)
    return y.astype(orig)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps):
    x = x_ref[...].astype(jnp.float32)          # [1, H, W, C]
    _, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(h * w, groups, cg)
    n = h * w * cg
    mean = xg.sum(axis=(0, 2)) / n              # [groups]
    sq = (xg * xg).sum(axis=(0, 2)) / n
    var = sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xn = (xg - mean[None, :, None]) * inv[None, :, None]
    y = xn.reshape(1, h, w, c) * scale_ref[...] + bias_ref[...]
    o_ref[...] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_pallas(x: Array, scale: Array, bias: Array,
                    num_groups: int, eps: float,
                    interpret: bool = False) -> Array:
    b, h, w, c = x.shape
    g = min(num_groups, c)
    kernel = functools.partial(_gn_silu_kernel, groups=g, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.astype(jnp.float32), bias.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_groupnorm_silu(x: Array, scale: Array, bias: Array,
                         num_groups: int = 32, eps: float = 1e-5,
                         interpret: bool = False) -> Array:
    """silu(groupnorm(x) * scale + bias), one VMEM pass per batch row.

    x: [B, H, W, C] (bf16 or fp32); scale/bias: [C]. Dispatches by the
    platform the computation actually LOWERS to (lax.platform_dependent,
    like ops/attention.py): the Pallas kernel on TPU, the pure-jax formula
    elsewhere (CPU init / tests / multichip dryrun)."""
    if interpret:
        return _gn_silu_pallas(x, scale, bias, num_groups, eps, True)
    return jax.lax.platform_dependent(
        x, scale, bias,
        tpu=lambda a, s, b: _gn_silu_pallas(a, s, b, num_groups, eps),
        default=lambda a, s, b: _gn_silu_reference(a, s, b, num_groups, eps),
    )


def _fwd(x, scale, bias, num_groups, eps, interpret):
    return (
        fused_groupnorm_silu(x, scale, bias, num_groups, eps, interpret),
        (x, scale, bias),
    )


def _bwd(num_groups, eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_silu_reference(xx, ss, bb, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


fused_groupnorm_silu.defvjp(_fwd, _bwd)

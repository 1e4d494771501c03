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


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps,
                    row_tile):
    # Two Mosaic constraints shape this kernel:
    #  * the lane (channel) dim can't be shape-cast, so the [C] -> [groups]
    #    reduction runs as a 0/1 group-membership matmul on the MXU instead
    #    of a reshape to [..., groups, C//groups];
    #  * whole-sample fp32 temporaries blow the 16M scoped-vmem limit at the
    #    64x64x320 level, so both passes stream row tiles via fori_loop
    #    (live fp32 state is one [row_tile, W, C] slab + [1, C] vectors).
    _, h, w, c = x_ref.shape
    cg = c // groups
    n = h * w * cg
    iters = h // row_tile

    def stats_body(i, acc):
        s1, s2 = acc
        rows = x_ref[0, pl.ds(i * row_tile, row_tile)].astype(jnp.float32)
        s1 = s1 + jnp.sum(rows, axis=(0, 1), keepdims=True).reshape(1, c)
        s2 = s2 + jnp.sum(rows * rows, axis=(0, 1), keepdims=True).reshape(1, c)
        return s1, s2

    z = jnp.zeros((1, c), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, iters, stats_body, (z, z))

    chan = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (chan // cg == grp).astype(jnp.float32)     # [C, groups]

    g1 = jax.lax.dot(s1, member) / n                     # [1, groups] mean
    g2 = jax.lax.dot(s2, member) / n
    inv = jax.lax.rsqrt(g2 - g1 * g1 + eps)              # [1, groups]

    mean_c = jax.lax.dot(g1, member.T)                   # [1, C]
    inv_c = jax.lax.dot(inv, member.T)
    scale = scale_ref[...]                               # [1, C]
    # fold normalize+affine: y = x * sc + off
    sc = (inv_c * scale)[:, None, :]                     # [1, 1, C]
    off = (bias_ref[...] - mean_c * inv_c * scale)[:, None, :]

    def apply_body(i, _):
        rows = x_ref[0, pl.ds(i * row_tile, row_tile)].astype(jnp.float32)
        y = rows * sc + off
        o_ref[0, pl.ds(i * row_tile, row_tile)] = (
            y * jax.nn.sigmoid(y)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, iters, apply_body, 0)


def _gn_silu_pallas(x: Array, scale: Array, bias: Array,
                    num_groups: int, eps: float,
                    interpret: bool = False) -> Array:
    b, h, w, c = x.shape
    g = min(num_groups, c)
    row_tile = 8 if h % 8 == 0 else 1
    kernel = functools.partial(
        _gn_silu_kernel, groups=g, eps=eps, row_tile=row_tile
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            # scale/bias as [1, C]: Mosaic wants >=2-D vector layouts
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.astype(jnp.float32).reshape(1, c),
      bias.astype(jnp.float32).reshape(1, c))


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
    # Measured on the v5e (PROFILE.md): the streamed kernel wins only where
    # the spatial extent is large (64x64x320 UNet level, -22% vs the XLA
    # fusion); at 32x32/16x16/8x8 the fori_loop overhead loses to XLA. The
    # footprint cap keeps the double-buffered in+out blocks inside the 16M
    # scoped-vmem limit — the up-path ResBlock in_norms at skip-concat widths
    # (64x64x640/960) would need 21-32M, so they take the XLA path. The
    # shape gate is static so each call site compiles exactly one branch.
    if (
        x.ndim != 4
        or x.shape[-1] % num_groups  # kernel's membership matmul needs C|G
        or (x.shape[1] * x.shape[2]) < 4096
        or x.shape[1] % 8
        or x.shape[1] * x.shape[2] * x.shape[3] > 64 * 64 * 320
    ):
        return _gn_silu_reference(x, scale, bias, num_groups, eps)
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

"""Pallas TPU flash attention, forward and streaming backward.

Used for the UNet's 4096-token self-attention at the full-resolution level
(64x64 latent, reference attention.py:230-266 runs it O(N^2) in HBM); this
kernel keeps the softmax streaming in VMEM with online max/sum renormalization
so the N x N logits never materialize in HBM.

Layout: [B, N, H, D] -> [B*H, N, D]; grid over (batch*heads, query tiles);
keys/values are streamed in TILE_K chunks with an fori_loop. Accumulation is
float32 regardless of input dtype. Head dims here are 40/80/160 (ch/heads) —
the MXU pads lanes to 128, which still beats spilling the 4096^2 logits.

Backward (default, `_BWD_MODE == "pallas"`): streaming flash backward — the
forward also emits the per-row logsumexp, and two Pallas kernels recompute
the probability tiles in VMEM to accumulate dq (grid over query tiles) and
dk/dv (grid over key tiles), so the N x N matrices never hit HBM in either
direction. `MOBI_FLASH_BWD=xla` instead wraps a jax.custom_vjp that
recomputes attention with the XLA path and differentiates that; the training
path can also select backend="xla" outright.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Softmax exponential variant for the forward kernel (A/B, see PROFILE.md
# round-7 "flash kernel ceiling decomposition"):
#   exp          — natural-base online softmax (default)
#   exp2         — base-2 online softmax: scale folds in log2(e), the
#                  running max / renorm / sum all live in the base-2 log
#                  domain, and acc/l cancels the base exactly — numerics
#                  match exp to fp32 rounding while the VPU evaluates the
#                  cheaper 2^x
#   noexp-timing — DIAGNOSTIC ONLY: replaces exp with an affine map to
#                  measure the transcendental's share of kernel time;
#                  output values are garbage
_EXP_MODE = os.environ.get("MOBI_FLASH_EXP", "exp")

# Transposed-accumulator AV: keep the output accumulator as [D, TQ] so the
# P·V matmul contracts over TK with N=TQ instead of producing a [TQ, D=40]
# result whose minor dim is lane-padded to 128. MEASURED SLOWER on the v5e
# (full bench 18.3 s vs 11.7 s per batch-4: the extra transposes + smaller
# q-tile cost more than the lane padding saves — Mosaic evidently handles
# the narrow-output dot better than the padding model predicts). Kept as an
# A/B-able variant; default OFF.
TRANSPOSED_AV = os.environ.get("MOBI_FLASH_TRANSPOSED_AV", "0") == "1"


def _flash_kernel_tav(q_ref, k_ref, v_ref, o_ref, *, tile_k: int, scale: float):
    """Flash forward with the [D, TQ] transposed accumulator (see
    TRANSPOSED_AV above). Numerics identical to _flash_kernel."""
    q = q_ref[0]                                      # [TQ, D]
    tq, d = q.shape
    n = k_ref.shape[1]
    num_k = n // tile_k

    def body(j, carry):
        acc_t, m_prev, l_prev = carry                 # acc_t: [D, TQ]
        k = k_ref[0, pl.ds(j * tile_k, tile_k), :]    # [TK, D]
        v = v_ref[0, pl.ds(j * tile_k, tile_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # [TQ, TK] fp32
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)            # [TQ, 1]
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # [D, TQ] = v^T [D, TK] . p^T [TK, TQ]: contraction TK, N=TQ — no
        # lane padding from the 40-wide head dim
        pv_t = jax.lax.dot_general(
            v, p.astype(v.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_t = acc_t * alpha[:, 0][None, :] + pv_t
        return acc_t, m_new, l_new

    acc0 = jnp.zeros((d, tq), jnp.float32)
    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc_t, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    out_t = acc_t / l[:, 0][None, :]                  # [D, TQ]
    o_ref[0] = out_t.T.astype(o_ref.dtype)


def _exp_fn():
    """(exp-like fn, scale multiplier) for the configured _EXP_MODE. In
    exp2 mode the logits are pre-scaled by log2(e), so the whole online-
    softmax recurrence (max, renorm alpha, sum) runs in the base-2 log
    domain; acc/l cancels the base exactly."""
    if _EXP_MODE == "exp2":
        return jnp.exp2, 1.4426950408889634  # log2(e)
    if _EXP_MODE == "noexp-timing":
        return (lambda x: x * 1e-3 + 0.5), 1.0
    return jnp.exp, 1.0


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, tile_k: int, scale: float):
    # Dots run in the INPUT dtype (bf16 on the production path) with fp32
    # accumulation — the v5e MXU is native bf16xbf16->fp32; upcasting the
    # operands to fp32 forces multi-pass fp32 matmuls (~3-6x slower). Only
    # the softmax statistics and the output accumulator live in fp32.
    q = q_ref[0]                                      # [TQ, D], input dtype
    tq, d = q.shape
    n = k_ref.shape[1]
    num_k = n // tile_k
    exp_f, log_base = _exp_fn()
    scale = scale * log_base

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(j * tile_k, tile_k), :]    # [TK, D]
        v = v_ref[0, pl.ds(j * tile_k, tile_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # [TQ, TK] fp32
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = exp_f(logits - m_new)
        alpha = exp_f(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((tq, d), jnp.float32)
    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_tile(n: int, target: int) -> int:
    t = min(target, n)
    while n % t:
        t //= 2
    return max(t, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: [B, N, H, D] -> [B, N, H, D]."""
    return _flash_fwd_impl(q, k, v)


def _flash_fwd_impl(q, k, v, interpret: bool = False):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)

    # Tile choice for the MObI shapes (N=4096, d=40): the whole K/V stream
    # already resides in VMEM per block, so bigger K tiles just make bigger
    # MXU dots — [TQ, d] x [d, TK] with d=40 is lane-padded to 128, so
    # amortizing per-dot overhead matters. Whole-UNet A/B on the v5e:
    # TK 512 -> 222.7 ms/fwd, 2048 -> 209.6, 4096 -> 205.7 (fp32 logits tile
    # 512x4096 = 8 MB of VMEM, single K iteration).
    # tav only pays off where the head dim is far below the 128-lane width
    # (d=40 at the full-res level: 3.2x padding waste); at d>=64 the win is
    # small and its extra VMEM buffers can blow the 16M scoped-vmem limit
    # (observed at N=1024, d=80). Smaller q-tile keeps the fp32 logits tile
    # + transpose buffers within budget.
    use_tav = TRANSPOSED_AV and d < 64
    tile_q = _pick_tile(nq, 256 if use_tav else 512)
    tile_k = _pick_tile(nk, 4096)

    kernel_fn = _flash_kernel_tav if use_tav else _flash_kernel
    kernel = functools.partial(kernel_fn, tile_k=tile_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nq // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


def _xla_reference(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


# --------------------------------------------------------------- backward
# FlashAttention-2-style backward: the N x N probability matrix is
# recomputed tile-by-tile from (q, k, lse) in VMEM and never touches HBM.
# Without this, training materializes fp32 [B, H, 4096, 4096] logits in the
# UNet backward — 4 GB per ds-1 transformer block, 108 GB for the 512-config
# train step (observed OOM vs the 15.75 GB v5e HBM).
#
#   delta_i = rowsum(dO_i * O_i)
#   p_ij    = exp(q_i . k_j^T * scale - lse_i)
#   ds_ij   = p_ij * (dO_i . v_j^T - delta_i) * scale
#   dq_i    = sum_j ds_ij k_j     (dq kernel: grid over q tiles)
#   dk_j    = sum_i ds_ij^T q_i   (dkv kernel: grid over k tiles)
#   dv_j    = sum_i p_ij^T dO_i
#
# MOBI_FLASH_BWD=xla falls back to differentiating the XLA recompute.
_BWD_MODE = os.environ.get("MOBI_FLASH_BWD", "pallas")


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      tile_k: int, scale: float):
    """_flash_kernel that also writes lse = m + log(l) for the backward."""
    q = q_ref[0]
    tq, d = q.shape
    n = k_ref.shape[1]
    num_k = n // tile_k

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(j * tile_k, tile_k), :]
        v = v_ref[0, pl.ds(j * tile_k, tile_k), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((tq, d), jnp.float32)
    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)                       # [TQ, 1]


def _flash_fwd_lse_impl(q, k, v, interpret: bool = False):
    """Returns (out [B,N,H,D], lse [B*H, N, 1] fp32).

    lse rides as a trailing-singleton 3-D array: Mosaic cannot shape-cast a
    [TQ, 1] statistic onto the lane dim, so it is stored column-shaped."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    tile_q = _pick_tile(nq, 512)
    tile_k = _pick_tile(nk, 4096)
    kernel = functools.partial(_flash_kernel_lse, tile_k=tile_k, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, nq // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3), lse


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, tile_k: int, scale: float):
    q = q_ref[0]                                      # [TQ, D]
    do = do_ref[0]
    lse = lse_ref[0]                                  # [TQ, 1] fp32
    delta = delta_ref[0]
    tq, d = q.shape
    n = k_ref.shape[1]
    num_k = n // tile_k

    def body(j, acc):
        k = k_ref[0, pl.ds(j * tile_k, tile_k), :]    # [TK, D]
        v = v_ref[0, pl.ds(j * tile_k, tile_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # [TQ, TK]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [TQ, TK]
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, num_k, body, jnp.zeros((tq, d), jnp.float32))
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, tile_q: int, scale: float):
    k = k_ref[0]                                      # [TK, D]
    v = v_ref[0]
    tk, d = k.shape
    n = q_ref.shape[1]
    num_q = n // tile_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * tile_q, tile_q), :]    # [TQ, D]
        do = do_ref[0, pl.ds(i * tile_q, tile_q), :]
        lse = lse_ref[0, pl.ds(i * tile_q, tile_q)]   # [TQ, 1]
        delta = delta_ref[0, pl.ds(i * tile_q, tile_q)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # [TQ, TK]
        p = jnp.exp(s - lse)
        pt = p.astype(do.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            pt, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [TK, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [TQ, TK]
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [TK, D]
        return dk_acc, dv_acc

    z = jnp.zeros((tk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (z, z))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, interpret: bool = False):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    dof = do.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    # delta = rowsum(dO * O): elementwise + reduce, no N x N tensor
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(b * h, nq, 1)

    # fp32 [tile, loop-tile] temporaries bound VMEM here (s, p, dp, ds are
    # each tile x loop-tile fp32). loop tiles of 1024 put the dkv kernel
    # 864K over the 16M scoped-vmem limit at N=4096 (measured on the v5e);
    # 512 leaves ~5M headroom.
    tile_q = _pick_tile(nq, 512)
    tile_k = _pick_tile(nk, 512)
    loop_k = _pick_tile(nk, 512)
    loop_q = _pick_tile(nq, 512)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, tile_k=loop_k, scale=scale),
        grid=(b * h, nq // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, tile_q=loop_q, scale=scale),
        grid=(b * h, nk // tile_k),
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, nk, d), v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    unflat = lambda x, n: x.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return unflat(dq, nq), unflat(dk, nk), unflat(dv, nk)


def _fwd(q, k, v):
    if _BWD_MODE == "xla":
        return _flash_fwd_impl(q, k, v), (q, k, v, None, None)
    out, lse = jax.lax.platform_dependent(
        q, k, v,
        tpu=_flash_fwd_lse_impl,
        default=lambda a, b_, c: (
            _xla_reference(a, b_, c),
            jnp.zeros(
                (a.shape[0] * a.shape[2], a.shape[1], 1), jnp.float32
            ),
        ),
    )
    return out, (q, k, v, out, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    if _BWD_MODE == "xla" or o is None:
        _, vjp = jax.vjp(_xla_reference, q, k, v)
        return vjp(g)

    def xla_bwd(q_, k_, v_, o_, lse_, g_):
        _, vjp = jax.vjp(_xla_reference, q_, k_, v_)
        return vjp(g_)

    return jax.lax.platform_dependent(
        q, k, v, o, lse, g,
        tpu=_flash_bwd_impl,
        default=xla_bwd,
    )


flash_attention.defvjp(_fwd, _bwd)

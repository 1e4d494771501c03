"""Pallas TPU flash attention (forward) with an XLA-recompute backward.

Used for the UNet's 4096-token self-attention at the full-resolution level
(64x64 latent, reference attention.py:230-266 runs it O(N^2) in HBM); this
kernel keeps the softmax streaming in VMEM with online max/sum renormalization
so the N x N logits never materialize in HBM.

Layout: [B, N, H, D] -> [B*H, N, D]; grid over (batch*heads, query tiles);
keys/values are streamed in TILE_K chunks with an fori_loop. Accumulation is
float32 regardless of input dtype. Head dims here are 40/80/160 (ch/heads) —
the MXU pads lanes to 128, which still beats spilling the 4096^2 logits.

Backward: jax.custom_vjp recomputes attention with the XLA path and
differentiates that — correct gradients, one extra forward; the training path
can also select backend="xla" outright.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, tile_k: int, scale: float):
    # Dots run in the INPUT dtype (bf16 on the production path) with fp32
    # accumulation — the v5e MXU is native bf16xbf16->fp32; upcasting the
    # operands to fp32 forces multi-pass fp32 matmuls (~3-6x slower). Only
    # the softmax statistics and the output accumulator live in fp32.
    q = q_ref[0]                                      # [TQ, D], input dtype
    tq, d = q.shape
    n = k_ref.shape[1]
    num_k = n // tile_k

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


def _fwd(q, k, v):
    return _flash_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)

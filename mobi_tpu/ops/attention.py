"""Multi-head attention primitives.

`dot_product_attention` is the single attention entry point used by the UNet
transformer blocks, the VAE mid attention, and the CLIP tower. It computes
softmax in float32 regardless of the activation dtype (matching the
reference's fp16-safe attention, /root/reference/ldm/modules/attention.py:181-192
and openaimodel.py:480-487) and is written so XLA maps the two contractions
onto the MXU. A Pallas flash-attention kernel (mobi_tpu/ops/flash_attention.py)
can be selected for long self-attention sequences.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Minimum self-attention length for the Pallas flash kernel ("auto"
# backend); below it XLA's fused attention is used. 1024 keeps flash on
# both the 4096-token (d=40) and 1024-token (d=80) UNet levels — measured
# best on the v5e (see PROFILE.md). Env-tunable for whole-model A/B.
import os as _os

_FLASH_MIN_SEQ = int(_os.environ.get("MOBI_FLASH_MIN_SEQ", "1024"))


def split_heads(x: Array, num_heads: int) -> Array:
    """[B, N, H*D] -> [B, N, H, D]"""
    b, n, hd = x.shape
    return x.reshape(b, n, num_heads, hd // num_heads)


def merge_heads(x: Array) -> Array:
    """[B, N, H, D] -> [B, N, H*D]"""
    b, n, h, d = x.shape
    return x.reshape(b, n, h * d)


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    num_heads: int,
    mask: Optional[Array] = None,
    backend: str = "auto",
) -> Array:
    """Attention over packed-head inputs.

    Args:
      q: [B, Nq, H*D]
      k, v: [B, Nk, H*D]
      num_heads: number of heads H.
      mask: optional [B, Nq, Nk] boolean mask (True = keep).
      backend: "auto" | "xla" | "flash".

    Returns: [B, Nq, H*D]
    """
    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)

    if backend == "flash":
        from mobi_tpu.ops.flash_attention import flash_attention

        out = flash_attention(qh, kh, vh)
    elif backend == "auto" and (
        mask is None
        and qh.shape[1] >= _FLASH_MIN_SEQ
        and qh.shape[1] == kh.shape[1]
    ):
        # Select the kernel by the platform the computation actually LOWERS
        # to, not the process default backend: the same traced program may be
        # compiled for CPU (param init, tests, multichip dryrun) and for TPU
        # (the real bench/train path). Pallas only lowers on TPU.
        from mobi_tpu.ops.flash_attention import flash_attention

        out = jax.lax.platform_dependent(
            qh, kh, vh,
            tpu=flash_attention,
            default=lambda a, b, c: _xla_attention(a, b, c, None),
        )
    else:
        out = _xla_attention(qh, kh, vh, mask)
    return merge_heads(out)


def _xla_attention(
    q: Array, k: Array, v: Array, mask: Optional[Array]
) -> Array:
    """[B, N, H, D] attention with fp32 softmax."""
    dim_head = q.shape[-1]
    scale = dim_head**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, :, :], logits, big_neg)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)

"""Text-conditioning transformer stack (legacy LDM surface).

Equivalent of the reference's vendored lucidrains x_transformer
(/root/reference/ldm/modules/x_transformer.py: AttentionLayers :370,
Encoder :541, TransformerWrapper :548) and the BERTEmbedder /
SpatialRescaler conditioning encoders that consume it
(/root/reference/ldm/modules/encoders/modules.py:84-139). Not used by the
shipped MObI configs (conditioning is CLIP-image + bbox), but part of the
LDM config surface for text-to-image variants.

TPU notes: fixed max_seq_len (77) keeps every shape static; attention runs
through the shared `dot_product_attention` entry point.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mobi_tpu.models.layers import Dense, LayerNorm
from mobi_tpu.ops.attention import dot_product_attention

Array = jnp.ndarray


class EncoderBlock(nn.Module):
    """Pre-LN self-attention + GELU MLP block (x_transformer AttentionLayers
    'encoder' arrangement: no causal mask, residual around each sublayer)."""

    heads: int = 8
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        d = x.shape[-1]
        h = LayerNorm(dtype=self.dtype, name="attn_norm")(x)
        q = Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(h)
        att = dot_product_attention(
            q, k, v, num_heads=self.heads, mask=mask, backend="xla"
        )
        x = x + Dense(d, dtype=self.dtype, name="to_out")(att)
        h = LayerNorm(dtype=self.dtype, name="ff_norm")(x)
        h = Dense(d * self.ff_mult, dtype=self.dtype, name="ff_in")(h)
        h = nn.gelu(h, approximate=False)
        return x + Dense(d, dtype=self.dtype, name="ff_out")(h)


class TransformerWrapper(nn.Module):
    """Token + learned positional embeddings over an encoder stack
    (x_transformer TransformerWrapper :548). `return_embeddings` semantics:
    this module always returns the final hidden states [B, N, dim]; a logits
    head (`num_tokens` projection) is applied only via `logits()`."""

    num_tokens: int = 30522
    max_seq_len: int = 77
    dim: int = 1280
    depth: int = 32
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, token_ids: Array, mask: Optional[Array] = None
    ) -> Array:
        b, n = token_ids.shape
        tok = self.param(
            "token_emb", nn.initializers.normal(0.02),
            (self.num_tokens, self.dim), jnp.float32,
        )
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (self.max_seq_len, self.dim), jnp.float32,
        )
        x = tok[token_ids].astype(self.dtype) + pos[:n].astype(self.dtype)[None]
        attn_mask = None
        if mask is not None:
            # key-padding mask [B, N] -> [B, Nq, Nk]
            attn_mask = jnp.broadcast_to(mask[:, None, :], (b, n, n))
        for i in range(self.depth):
            x = EncoderBlock(
                heads=self.heads, dtype=self.dtype, name=f"block_{i}"
            )(x, attn_mask)
        return LayerNorm(dtype=self.dtype, name="final_norm")(x)


class BERTEmbedder(nn.Module):
    """BERT-vocab text conditioning encoder (modules.py:84-108): token ids
    [B, 77] -> [B, 77, n_embed] context. Tokenization is a host-side concern
    (`tokenize_bert` below); the module consumes ids so it stays jittable."""

    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: Array) -> Array:
        return TransformerWrapper(
            num_tokens=self.vocab_size,
            max_seq_len=self.max_seq_len,
            dim=self.n_embed,
            depth=self.n_layer,
            dtype=self.dtype,
            name="transformer",
        )(token_ids)


def tokenize_bert(texts, max_length: int = 77):
    """Host-side BERT tokenization (reference BERTTokenizer,
    modules.py:57-81). Requires transformers with local vocab; raises
    RuntimeError otherwise."""
    import numpy as np

    try:
        from transformers import BertTokenizerFast
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(f"transformers unavailable: {e}")
    tok = BertTokenizerFast.from_pretrained("bert-base-uncased")
    enc = tok(
        texts, truncation=True, max_length=max_length,
        padding="max_length", return_tensors="np",
    )
    return np.asarray(enc["input_ids"], dtype=np.int32)


class SpatialRescaler(nn.Module):
    """n-stage spatial rescale + optional 1x1 channel remap
    (modules.py:111-139), NHWC."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import jax

        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x,
                (b, int(h * self.multiplier), int(w * self.multiplier), c),
                self.method,
            )
        if self.out_channels is not None:
            x = nn.Conv(
                self.out_channels, (1, 1), use_bias=self.use_bias,
                name="channel_mapper",
            )(x)
        return x

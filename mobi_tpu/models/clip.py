"""CLIP ViT vision tower in flax (NHWC), matching HF `CLIPVisionModel`
semantics for openai/clip-vit-large-patch14 — the frozen reference-image
encoder of the conditioning stage
(/root/reference/ldm/modules/encoders/modules.py:142-170).

Implemented from scratch for TPU (single fused attention per layer, fp32
layernorms); weights are imported from a torch checkpoint by
mobi_tpu/import_torch.py.

ViT-L/14: patch 14, image 224 -> 256 patches + CLS, width 1024, 24 layers,
16 heads, quick-GELU MLP x4, pre-LN; pooler output = post_layernorm(CLS).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mobi_tpu.models.layers import Dense, LayerNorm
from mobi_tpu.ops.attention import dot_product_attention

Array = jnp.ndarray

# CLIP preprocessing constants (HF CLIPImageProcessor)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x: Array) -> Array:
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        q = Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = Dense(d, dtype=self.dtype, name="v_proj")(x)
        out = dot_product_attention(q, k, v, num_heads=self.num_heads, backend="xla")
        return Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        h = LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype, name="self_attn")(h)
        h = LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        h = Dense(d * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Returns the pooled CLS feature (HF `pooler_output`), shape [B, width]."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array) -> Array:
        """pixel_values: [B, H, W, 3], already CLIP-normalized."""
        b = pixel_values.shape[0]
        n_pos = (self.image_size // self.patch_size) ** 2 + 1

        patches = nn.Conv(
            features=self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, self.width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (b, 1, self.width)
        )
        x = jnp.concatenate([cls, patches], axis=1)

        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, self.width), jnp.float32,
        )
        x = x + pos.astype(self.dtype)[None]

        x = LayerNorm(dtype=self.dtype, name="pre_layernorm")(x)
        for i in range(self.layers):
            x = CLIPEncoderLayer(self.heads, dtype=self.dtype, name=f"layer_{i}")(x)
        pooled = LayerNorm(dtype=self.dtype, name="post_layernorm")(x[:, 0])
        return pooled


class CLIPTextTower(nn.Module):
    """CLIP text transformer (HF `CLIPTextModel` semantics, ViT-B/32 text
    config by default: width 512, 12 layers, 8 heads, vocab 49408, 77 ctx).

    Token + positional embeddings, causally masked pre-LN encoder, final
    layernorm. Returns the full last_hidden_state [B, N, width]; the
    reference's ClassEmbedder takes the BOS position
    (/root/reference/ldm/modules/encoders/modules.py:17-37 last_hidden_state
    [:, 0]) and the CLIP projection path takes the EOS position.
    """

    vocab_size: int = 49408
    max_positions: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        b, n = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width), jnp.float32,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (self.max_positions, self.width), jnp.float32,
        )
        x = tok[input_ids].astype(self.dtype) + pos[:n].astype(self.dtype)[None]
        causal = jnp.tril(jnp.ones((n, n), bool))[None]
        causal = jnp.broadcast_to(causal, (b, n, n))
        for i in range(self.layers):
            h = LayerNorm(dtype=self.dtype, name=f"layer_{i}_ln1")(x)
            d = h.shape[-1]
            q = Dense(d, dtype=self.dtype, name=f"layer_{i}_q")(h)
            k = Dense(d, dtype=self.dtype, name=f"layer_{i}_k")(h)
            v = Dense(d, dtype=self.dtype, name=f"layer_{i}_v")(h)
            att = dot_product_attention(
                q, k, v, num_heads=self.heads, mask=causal, backend="xla"
            )
            x = x + Dense(d, dtype=self.dtype, name=f"layer_{i}_out")(att)
            h = LayerNorm(dtype=self.dtype, name=f"layer_{i}_ln2")(x)
            h = Dense(d * 4, dtype=self.dtype, name=f"layer_{i}_fc1")(h)
            h = quick_gelu(h)
            x = x + Dense(d, dtype=self.dtype, name=f"layer_{i}_fc2")(h)
        return LayerNorm(dtype=self.dtype, name="final_layernorm")(x)


def clip_normalize(images: Array) -> Array:
    """Map [-1, 1]-ranged RGB (NHWC) to CLIP-normalized pixel values."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=images.dtype)
    x01 = (images + 1.0) / 2.0
    return (x01 - mean) / std

"""Conditioning encoders: frozen CLIP image embedder (+ 1-token mapper) and
the trainable 3D-bbox Fourier embedder.

Parity with /root/reference/ldm/modules/encoders/modules.py:142-266 and the
mapper transformer in /root/reference/ldm/modules/encoders/xf.py:82-130.

Output contract (modules.py:172-180): `encode(cond)` returns
  {"ref_image_token": [B, 1, 1024], "ref_bbox_token": [B, 1, 768]}
The 1024->768 projection of the image token lives in the diffusion model
(reference ddpm.py:479,622), not here.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mobi_tpu.models.clip import CLIPVisionTower
from mobi_tpu.models.layers import Dense, LayerNorm
from mobi_tpu.ops.attention import dot_product_attention

Array = jnp.ndarray


class XFAttentionBlock(nn.Module):
    """Residual pre-LN attention block (xf.py:82-103): fused QKV projection,
    softmax in fp32, GELU MLP x4."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        b, n, _ = x.shape
        h = LayerNorm(dtype=self.dtype, name="ln_1")(x)
        qkv = Dense(d * 3, dtype=self.dtype, name="c_qkv")(h)
        # xf.py:66-73 packs the fused projection PER HEAD as
        # [h0_q, h0_k, h0_v, h1_q, ...] (not thirds); identical for heads=1
        # (the shipped mapper) but kept exact for any head count.
        dh = d // self.heads
        qkv = qkv.reshape(b, n, self.heads, 3 * dh)
        q, k, v = (
            qkv[..., :dh], qkv[..., dh : 2 * dh], qkv[..., 2 * dh :]
        )
        q = q.reshape(b, n, d)
        k = k.reshape(b, n, d)
        v = v.reshape(b, n, d)
        a = dot_product_attention(q, k, v, num_heads=self.heads, backend="xla")
        x = x + Dense(d, dtype=self.dtype, name="c_proj")(a)
        h = LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = Dense(d * 4, dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        x = x + Dense(d, dtype=self.dtype, name="mlp_c_proj")(h)
        return x


class XFTransformer(nn.Module):
    """Stack of XFAttentionBlocks — the CLIP-token `mapper`
    (modules.py:153: Transformer(1, 1024, 5, 1))."""

    layers: int = 5
    heads: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.layers):
            x = XFAttentionBlock(self.heads, dtype=self.dtype, name=f"resblock_{i}")(x)
        return x


def fourier_embed(x: Array, num_freqs: int = 4, include_input: bool = True) -> Array:
    """NeRF-style positional embedding (modules.py:217-266).

    Concatenates [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] over the
    last axis with log-spaced freq_bands 2^linspace(0, num_freqs-1, num_freqs).
    """
    freq_bands = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    parts = [x] if include_input else []
    for freq in freq_bands:
        parts.append(jnp.sin(x * freq))
        parts.append(jnp.cos(x * freq))
    return jnp.concatenate(parts, axis=-1)


def fourier_out_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dims * (2 * num_freqs + (1 if include_input else 0))


class BBoxEmbedder(nn.Module):
    """8 bbox corners x (x, y, depth) -> 1 conditioning token
    (modules.py:182-210)."""

    num_freqs: int = 4
    proj_dims: Sequence[int] = (768, 512, 512, 768)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bbox: Array) -> Array:
        """bbox: [B, 8, 3] normalized corner coordinates -> [B, 1, 768]."""
        emb = fourier_embed(bbox.astype(self.dtype), self.num_freqs)
        # Flatten [B, 8, F] -> [B, 8F] as a concat of static corner slices
        # instead of a reshape: under pjit, a reshape that merges a dim
        # adjacent to the sharded batch axis makes GSPMD fall back to
        # "involuntary full rematerialization" (replicate-then-repartition
        # — an all-gather of the conditioning activations every train step
        # on a real pod; MULTICHIP_r03 tail). Concatenating [B, F] slices
        # keeps the batch sharding intact, and the row-major layout is
        # identical, so torch checkpoint parity is unchanged.
        emb = jnp.concatenate(
            [emb[:, c, :] for c in range(emb.shape[1])], axis=-1
        )
        h = Dense(self.proj_dims[0], dtype=self.dtype, name="bbox_proj")(emb)
        h = Dense(self.proj_dims[1], dtype=self.dtype, name="linear_1")(h)
        h = nn.silu(h)
        h = Dense(self.proj_dims[2], dtype=self.dtype, name="linear_2")(h)
        h = nn.silu(h)
        h = Dense(self.proj_dims[3], dtype=self.dtype, name="linear_3")(h)
        return h[:, None, :]


class CondStageModel(nn.Module):
    """FrozenCLIPImageEmbedder equivalent (modules.py:142-180).

    conditions: subset of ("ref_image", "ref_bbox"). The CLIP tower + mapper
    + final LN are frozen; the bbox embedder is trainable (its param paths
    contain "bbox_embedder", used by the optimizer partition).
    """

    conditions: Sequence[str] = ("ref_image", "ref_bbox")
    clip_width: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if "ref_image" in self.conditions:
            self.transformer = CLIPVisionTower(dtype=self.dtype)
            self.mapper = XFTransformer(layers=5, heads=1, dtype=self.dtype)
            self.final_ln = LayerNorm(dtype=self.dtype)
        if "ref_bbox" in self.conditions:
            self.bbox_embedder = BBoxEmbedder(dtype=self.dtype)

    def embed_image(self, pixel_values: Array) -> Array:
        """CLIP-normalized [B, 224, 224, 3] -> [B, 1, 1024]."""
        z = self.transformer(pixel_values)
        z = z[:, None, :]
        z = self.mapper(z)
        return self.final_ln(z)

    def __call__(self, cond: Dict[str, Array]) -> Dict[str, Array]:
        ret = {}
        if "ref_image" in self.conditions and "ref_image" in cond:
            ret["ref_image_token"] = self.embed_image(cond["ref_image"])
        if "ref_bbox" in self.conditions and "ref_bbox" in cond:
            ret["ref_bbox_token"] = self.bbox_embedder(cond["ref_bbox"])
        return ret


class ClassEmbedder(nn.Module):
    """Class-label conditioning via precomputed CLIP-text CLS embeddings
    (/root/reference/ldm/modules/encoders/modules.py:17-37: runs "a {class}"
    prompts through a CLIP text model once at construction, then indexes the
    BOS/CLS row per label).

    The embedding table is a (frozen) parameter so it rides checkpoints; use
    `compute_class_text_embeddings` to fill it from a torch CLIP text model
    (host-side, once) and pass the result as `table_init`.
    """

    num_classes: int
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: Array) -> Array:
        table = self.param(
            "text_embeddings", nn.initializers.normal(0.02),
            (self.num_classes, self.embed_dim), jnp.float32,
        )
        return table[labels.astype(jnp.int32)].astype(self.dtype)


def compute_class_text_embeddings(classes, version="openai/clip-vit-large-patch14"):
    """Host-side helper mirroring the reference ClassEmbedder constructor:
    tokenize 'a {c}' prompts ('empty' stays bare) and return the CLS rows of a
    torch CLIP text model as a [n_classes, width] numpy array. Gated on
    transformers being importable with local weights; raises RuntimeError
    otherwise (zero-egress environments must pass a cached table instead)."""
    import numpy as np

    try:
        import torch
        from transformers import CLIPTextModel, CLIPTokenizer
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(f"transformers/torch unavailable: {e}")
    tokenizer = CLIPTokenizer.from_pretrained(version)
    text_model = CLIPTextModel.from_pretrained(version)
    texts = ["a " + c if c != "empty" else c for c in classes]
    inputs = tokenizer(texts, return_tensors="pt", padding=True, truncation=True)
    with torch.no_grad():
        hidden = text_model(**inputs).last_hidden_state
    return np.asarray(hidden[:, 0, :].cpu().numpy(), dtype=np.float32)

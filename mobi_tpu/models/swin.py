"""Swin Transformer (tiny) camera backbone + GeneralizedLSSFPN neck, NHWC.

TPU-native equivalents of the reference BEVFusion camera encoder
(/root/reference/bevfusion/mmdet3d/models/backbones — mmdet SwinTransformer,
swin-T: embed 96, depths [2,2,6,2], heads [3,6,12,24], window 7,
out_indices (1,2,3) -> channels (192, 384, 768); and
mmdet3d/models/necks/generalized_lss.py:13-110).

Design notes:
  * window partition/shift/merge are pure reshapes + rolls — free on TPU;
    the attention itself is a batched [nW*B, 49, C] computation that maps to
    the MXU via the shared dot_product_attention.
  * relative position bias indices and the shifted-window attention mask are
    computed with numpy at trace time (shapes are static under jit).
  * dropout / drop-path are inference-time identities and omitted.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.models.layers import LayerNorm
from mobi_tpu.ops.attention import dot_product_attention

Array = jnp.ndarray


def _rel_pos_index(w: int) -> np.ndarray:
    """[w*w, w*w] lookup into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _window_partition(x: Array, w: int) -> Array:
    """[B, H, W, C] -> [B*nW, w*w, C] (H, W already multiples of w)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(windows: Array, w: int, h: int, wd: int) -> Array:
    b = windows.shape[0] // ((h // w) * (wd // w))
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def _shift_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """Additive attention mask [nW, w*w, w*w] for shifted windows (0 within
    the same region, -100 across regions)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)
    mask = (win[:, :, None] != win[:, None, :]).astype(np.float32) * -100.0
    return mask


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x: Array, mask: Array | None) -> Array:
        n = x.shape[1]
        qkv = nn.Dense(self.dim * 3, param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = self.dim // self.heads
        scale = dh**-0.5
        qh = q.reshape(-1, n, self.heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(-1, n, self.heads, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(-1, n, self.heads, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh * scale, kh,
            preferred_element_type=jnp.float32,
        )
        table = self.param(
            "rel_bias", nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads), jnp.float32,
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx].transpose(2, 0, 1)  # [heads, n, n]
        logits = logits + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(-1, nw, self.heads, n, n)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(-1, self.heads, n, n)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh)
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, self.dim)
        return nn.Dense(self.dim, param_dtype=jnp.float32, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, wd, c = x.shape
        w = self.window
        shortcut = x
        x = LayerNorm(name="norm1")(x)

        pad_h = (w - h % w) % w
        pad_w = (w - wd % w) % w
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, wd + pad_w

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, w, self.shift))
        else:
            mask = None

        windows = _window_partition(x, w)
        windows = WindowAttention(
            self.dim, self.heads, w, name="attn"
        )(windows, mask)
        x = _window_reverse(windows, w, hp, wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :h, :wd]
        x = shortcut + x

        y = LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, param_dtype=jnp.float32,
                     name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, param_dtype=jnp.float32, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = LayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, param_dtype=jnp.float32,
                        name="reduction")(x)


class SwinTransformerTPU(nn.Module):
    """Swin-T multi-scale camera backbone; returns the feature maps at
    out_indices (default strides 8/16/32 with channels 192/384/768)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    out_indices: Sequence[int] = (1, 2, 3)

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        """x: [B, H, W, 3] -> tuple of [B, H/2^(i+2), W/2^(i+2), C_i]."""
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = LayerNorm(name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for si, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            for bi in range(depth):
                x = SwinBlock(
                    dim, heads, self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    name=f"stage{si}_block{bi}",
                )(x)
            if si in self.out_indices:
                outs.append(LayerNorm(name=f"out_norm{si}")(x))
            if si < len(self.depths) - 1:
                x = PatchMerging(dim * 2, name=f"merge{si}")(x)
                dim *= 2
        return tuple(outs)


def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix with align_corners=True
    semantics (torch F.interpolate(..., align_corners=True)): output i
    samples input at i*(n_in-1)/(n_out-1). Built host-side at trace time
    (static shapes) so the resize lowers to a single MXU matmul per axis."""
    M = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        M[:, 0] = 1.0
        return M
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (pos - lo).astype(np.float32)
    M[np.arange(n_out), lo] += 1.0 - w
    M[np.arange(n_out), hi] += w
    return M


def resize_bilinear_align_corners(x: Array, out_hw: Tuple[int, int]) -> Array:
    """NHWC bilinear resize matching torch align_corners=True (the
    reference FPN's upsample_cfg, necks/generalized_lss.py:24,91-96)."""
    oh, ow = out_hw
    b, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        Mh = jnp.asarray(_align_corners_matrix(h, oh))
        x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    if w != ow:
        Mw = jnp.asarray(_align_corners_matrix(w, ow))
        x = jnp.einsum("ow,bhwc->bhoc", Mw, x)
    return x


class _FPNConvModule(nn.Module):
    ch: int
    k: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.k // 2
        x = nn.Conv(self.ch, (self.k, self.k), padding=((p, p), (p, p)),
                    use_bias=False, param_dtype=jnp.float32, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.ch,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.ch,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return nn.relu(x)


class GeneralizedLSSFPN(nn.Module):
    """Top-down FPN with concat fusion (necks/generalized_lss.py:13-110):
    per level, bilinear-upsample the coarser map to this level's size,
    concat, 1x1 conv, 3x3 conv. Returns len(in)-1 maps."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        laterals = list(inputs)
        n = len(laterals) - 1
        for i in range(n - 1, -1, -1):
            up = resize_bilinear_align_corners(
                laterals[i + 1], laterals[i].shape[1:3]
            )
            cat = jnp.concatenate([laterals[i], up], axis=-1)
            h = _FPNConvModule(self.out_channels, k=1, name=f"lateral{i}")(cat)
            laterals[i] = _FPNConvModule(
                self.out_channels, k=3, name=f"fpn{i}"
            )(h)
        return tuple(laterals[:n])

"""Shared NN building blocks (NHWC, flax.linen).

Numerics follow the reference VAE/UNet primitives:
  * GroupNorm: 32 groups, eps=1e-6 for VAE blocks
    (/root/reference/ldm/modules/diffusionmodules/model.py:38-39), eps=1e-5
    (torch default) for UNet blocks (openaimodel -> GroupNorm32,
    diffusionmodules/util.py:199-216); computed in float32.
  * swish nonlinearity (model.py:33-35).
  * Downsample: stride-2 conv with asymmetric (0,1)x(0,1) padding
    (model.py:60-79).
  * Upsample: nearest x2 + 3x3 conv (model.py:42-57).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, float32 compute.

    `fuse_silu=True` computes silu(groupnorm(x)) through the Pallas
    single-pass kernel (ops/fused_norm.py) on TPU — callers must then skip
    their own swish. Parameter tree is identical either way."""

    num_groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.fuse_silu and x.ndim == 4:
            from mobi_tpu.ops.fused_norm import fused_groupnorm_silu

            return fused_groupnorm_silu(
                x, scale, bias, self.num_groups, self.eps
            )
        x = x.astype(jnp.float32)
        spatial = x.shape[1:-1]
        # real configs always have c >= 32; clamp only for tiny test widths
        g = min(self.num_groups, c)
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        xg = x.reshape(x.shape[0], *spatial, g, c // g)
        red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = xg.mean(axis=red_axes, keepdims=True)
        var = xg.var(axis=red_axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        x = xg.reshape(x.shape[0], *spatial, c)
        x = x * scale + bias
        return x.astype(orig_dtype)


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible default init (uniform fan-in)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: "str | Sequence[Tuple[int, int]]" = "SAME"
    use_bias: bool = True
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            bias_init = nn.initializers.zeros
        else:
            kernel_init = nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"
            )
            bias_init = nn.initializers.zeros
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel_init = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
        )
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm with float32 compute (fp16-safe, xf.py:22-28)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = x.astype(jnp.float32)
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (x * scale + bias).astype(orig_dtype)


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsampling, NHWC."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample_nearest_2x(x)
        if self.with_conv:
            x = Conv2d(x.shape[-1], (3, 3), dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.with_conv:
            # asymmetric padding: pad right/bottom by 1 (model.py:73-76)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = Conv2d(
                x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="conv",
            )(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlock(nn.Module):
    """VAE-style resnet block (model.py:82-141): GN -> swish -> conv,
    optional timestep projection, GN -> swish -> conv, 1x1 nin shortcut."""

    out_channels: Optional[int] = None
    kernel_size: Tuple[int, int] = (3, 3)
    temb_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None) -> Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = GroupNorm(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = Conv2d(out_ch, self.kernel_size, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = Dense(out_ch, dtype=self.dtype, name="temb_proj")(swish(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = Conv2d(out_ch, self.kernel_size, dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            x = Conv2d(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """VAE single-head spatial self-attention (model.py:150-202)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from mobi_tpu.ops.attention import dot_product_attention

        b, hgt, wdt, c = x.shape
        h = GroupNorm(dtype=self.dtype, name="norm")(x)
        q = Conv2d(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = Conv2d(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = Conv2d(c, (1, 1), dtype=self.dtype, name="v")(h)
        q = q.reshape(b, hgt * wdt, c)
        k = k.reshape(b, hgt * wdt, c)
        v = v.reshape(b, hgt * wdt, c)
        out = dot_product_attention(q, k, v, num_heads=1, backend="xla")
        out = out.reshape(b, hgt, wdt, c)
        out = Conv2d(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out

"""KL-VAE (camera RGB) and its lidar-range variant, NHWC flax.linen.

Architecture parity with the reference AutoencoderKL
(/root/reference/ldm/models/autoencoder.py:15-72) over the conv backbone in
/root/reference/ldm/modules/diffusionmodules/model.py:368-630:

  * Encoder: conv_in -> [num_res_blocks ResnetBlocks + optional attn,
    Downsample] per ch_mult level -> mid(block, attn, block) -> GN/swish ->
    conv_out (2*z_channels when double_z).
  * Decoder: conv_in -> mid -> [num_res_blocks+1 blocks + Upsample] reversed ->
    GN/swish -> conv_out.
  * lidar_adapter (model.py:384-401, 559-578): replaces the encoder conv_in
    with a (1,5) conv + two (1,5) ResnetBlocks, and the decoder tail with two
    (1,5) ResnetBlocks each followed by GroupNorm+swish (including the
    reference's extra norm after res_block_lidar1, model.py:617-618, kept for
    checkpoint parity) and a (1,5) conv_out.

Module/parameter names intentionally contain the substring "lidar" for the
adapter parts so the adapter-only finetuning partition (autoencoder.py:128-143)
is expressible as a name predicate.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mobi_tpu.models.layers import (
    AttnBlock,
    Conv2d,
    Downsample,
    GroupNorm,
    ResnetBlock,
    Upsample,
    swish,
)
from mobi_tpu.ops.distributions import DiagonalGaussian

Array = jnp.ndarray


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 512
    z_channels: int = 4
    double_z: bool = True
    lidar_adapter: bool = False
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # use_checkpoint -> flax remat per block (same pattern as
        # unet.py ResBlock remat): VAE training at 512^2 does not fit HBM
        # with stored activations. Param names/trees are unchanged.
        res_cls = nn.remat(ResnetBlock) if self.use_checkpoint else ResnetBlock
        attn_cls = nn.remat(AttnBlock) if self.use_checkpoint else AttnBlock
        if self.lidar_adapter:
            h = Conv2d(
                self.ch, (1, 5), dtype=self.dtype, name="conv_in_lidar"
            )(x)
            h = res_cls(
                self.ch, kernel_size=(1, 5), dtype=self.dtype,
                name="res_block_lidar1",
            )(h)
            h = res_cls(
                self.ch, kernel_size=(1, 5), dtype=self.dtype,
                name="res_block_lidar2",
            )(h)
        else:
            h = Conv2d(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)

        curr_res = self.resolution
        num_levels = len(self.ch_mult)
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = res_cls(
                    self.ch * mult, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
                if curr_res in self.attn_resolutions:
                    h = attn_cls(
                        dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}"
                    )(h)
            if i_level != num_levels - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        h = res_cls(dtype=self.dtype, name="mid_block_1")(h)
        h = attn_cls(dtype=self.dtype, name="mid_attn_1")(h)
        h = res_cls(dtype=self.dtype, name="mid_block_2")(h)

        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        h = Conv2d(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 512
    z_channels: int = 4
    lidar_adapter: bool = False
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array, return_prefinal: bool = False):
        res_cls = nn.remat(ResnetBlock) if self.use_checkpoint else ResnetBlock
        attn_cls = nn.remat(AttnBlock) if self.use_checkpoint else AttnBlock
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)

        h = Conv2d(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z)
        h = res_cls(dtype=self.dtype, name="mid_block_1")(h)
        h = attn_cls(dtype=self.dtype, name="mid_attn_1")(h)
        h = res_cls(dtype=self.dtype, name="mid_block_2")(h)

        for i_level in reversed(range(num_levels)):
            for i_block in range(self.num_res_blocks + 1):
                h = res_cls(
                    self.ch * self.ch_mult[i_level], dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
                if curr_res in self.attn_resolutions:
                    h = attn_cls(
                        dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}"
                    )(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        if self.lidar_adapter:
            h = res_cls(
                kernel_size=(1, 5), dtype=self.dtype, name="res_block_lidar1"
            )(h)
            # The extra norm+swish after res_block_lidar1 reproduces the
            # reference decoder exactly (model.py:617-618).
            h = GroupNorm(dtype=self.dtype, name="norm_out_lidar1")(h)
            h = swish(h)
            h = res_cls(
                kernel_size=(1, 5), dtype=self.dtype, name="res_block_lidar2"
            )(h)
            h = GroupNorm(dtype=self.dtype, name="norm_out_lidar2")(h)
            h = swish(h)
            pre = h
            h = Conv2d(self.out_ch, (1, 5), dtype=self.dtype, name="conv_out_lidar")(h)
        else:
            h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
            h = swish(h)
            pre = h
            h = Conv2d(self.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)
        # prefinal = input to the final conv: GAN adaptive-weight training
        # differentiates the loss w.r.t. ONLY the final kernel, which needs
        # just this activation (see train_autoencoder.py)
        return (h, pre) if return_prefinal else h


class AutoencoderKL(nn.Module):
    """Encoder + 1x1 quant convs + Decoder (autoencoder.py:29-72)."""

    embed_dim: int = 4
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 512
    z_channels: int = 4
    lidar_adapter: bool = False
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            resolution=self.resolution,
            z_channels=self.z_channels,
            double_z=True,
            lidar_adapter=self.lidar_adapter,
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch,
            out_ch=self.out_ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            resolution=self.resolution,
            z_channels=self.z_channels,
            lidar_adapter=self.lidar_adapter,
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
        )
        self.quant_conv = Conv2d(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = Conv2d(self.z_channels, (1, 1), dtype=self.dtype)

    def encode(self, x: Array) -> DiagonalGaussian:
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return DiagonalGaussian.from_moments(moments, channel_axis=-1)

    def decode(self, z: Array, return_prefinal: bool = False):
        z = self.post_quant_conv(z)
        return self.decoder(z, return_prefinal)

    def __call__(self, x: Array, rng: jax.Array, sample_posterior: bool = True):
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

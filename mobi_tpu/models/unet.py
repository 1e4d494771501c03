"""MObI UNet: SD-1.x eps-prediction UNet with reference cross-attention,
bbox-adapter attention, and camera<->lidar cross-modal attention.

Behavioral parity with /root/reference/ldm/modules/diffusionmodules/openaimodel.py:528-898
(UNetModel) and /root/reference/ldm/modules/attention.py:153-313
(CrossAttention / BasicTransformerBlock / SpatialTransformer), re-designed
for TPU:

  * NHWC layout throughout; attention over [B, N, C] token tensors.
  * The camera/lidar pairing uses the interleave contract of the reference
    (batch [cam0, lid0, cam1, lid1, ...], ldm/util.py:213-221): convs and
    norms are batch-elementwise so interleaving is free; cross-modal
    attention reshapes (2B, N, C) -> (B, 2, N, C) and swaps the modality
    axis — a pure view change, never crossing a batch shard as long as each
    device holds whole pairs.
  * Zero-initialized adapter connectors (attention.py:68-74) make the bbox
    and cross-modal branches identity at initialization.
  * Module names contain "cond_adapter" / "cross_modal" so the reference's
    adapter-only trainability rule (ddpm.py:1686-1698) is a name predicate.

Config for MObI-512 (configs/mobi_nusc_512.yaml:63-82): in 9ch, out 4ch,
model_channels 320, channel_mult (1,2,4,4), 2 res blocks, attention at
ds 1/2/4, 8 heads, context_dim 768, transformer depth 1.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from mobi_tpu.models.layers import Conv2d, Dense, GroupNorm, LayerNorm, swish
from mobi_tpu.ops.attention import dot_product_attention
from mobi_tpu.ops.schedules import timestep_embedding

Array = jnp.ndarray


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None
    (attention.py:153-194)."""

    heads: int
    dim_head: int
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = dot_product_attention(
            q, k, v, num_heads=self.heads, backend=self.attn_backend
        )
        return Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (attention.py:38-65), mult=4."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        h = a * nn.gelu(gate, approximate=False)
        return Dense(dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> CLIP cross-attn -> bbox adapter -> cross-modal -> FF
    (attention.py:197-266)."""

    heads: int
    dim_head: int
    bbox_cond: bool = False
    multimodal: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        attn = dict(heads=self.heads, dim_head=self.dim_head, dtype=self.dtype)

        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = CrossAttention(
            attn_backend=self.attn_backend, name="attn1", **attn
        )(h) + x

        # CLIP reference token only (attention.py:235: context[:, [0]])
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = CrossAttention(name="attn2", **attn)(h, context[:, :1]) + x

        if self.bbox_cond:
            h = LayerNorm(dtype=self.dtype, name="cond_adapter_norm")(x)
            h = CrossAttention(name="cond_adapter_attn", **attn)(h, context)
            x = Dense(
                x.shape[-1], zero_init=True, dtype=self.dtype,
                name="cond_adapter_connector",
            )(h) + x

        if self.multimodal:
            b2, n, c = x.shape
            pair = x.reshape(b2 // 2, 2, n, c)
            x_camera, x_lidar = pair[:, 0], pair[:, 1]

            h = LayerNorm(dtype=self.dtype, name="cross_modal_norm_camera")(x_camera)
            h = CrossAttention(
                attn_backend=self.attn_backend, name="cross_modal_attn_camera",
                **attn,
            )(h, x_lidar)
            x_camera = Dense(
                c, zero_init=True, dtype=self.dtype,
                name="cross_modal_connector_camera",
            )(h) + x_camera

            # the lidar branch attends to the ALREADY-UPDATED camera tokens
            # (attention.py:256-261 runs after the camera update)
            h = LayerNorm(dtype=self.dtype, name="cross_modal_norm_lidar")(x_lidar)
            h = CrossAttention(
                attn_backend=self.attn_backend, name="cross_modal_attn_lidar",
                **attn,
            )(h, x_camera)
            x_lidar = Dense(
                c, zero_init=True, dtype=self.dtype,
                name="cross_modal_connector_lidar",
            )(h) + x_lidar

            x = jnp.stack([x_camera, x_lidar], axis=1).reshape(b2, n, c)

        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = GEGLUFeedForward(dtype=self.dtype, name="ff")(h) + x
        return x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 proj_in -> transformer blocks -> zero 1x1 proj_out -> +x
    (attention.py:269-313)."""

    heads: int
    dim_head: int
    depth: int = 1
    bbox_cond: bool = False
    multimodal: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, hgt, wdt, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        x = Conv2d(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, hgt * wdt, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                bbox_cond=self.bbox_cond,
                multimodal=self.multimodal,
                attn_backend=self.attn_backend,
                dtype=self.dtype,
                name=f"block_{d}",
            )(x, context)
        x = x.reshape(b, hgt, wdt, inner)
        x = Conv2d(c, (1, 1), zero_init=True, dtype=self.dtype, name="proj_out")(x)
        return x + x_in


class ResBlock(nn.Module):
    """UNet residual block with timestep injection (openaimodel.py:163-275).
    GroupNorm eps follows torch default 1e-5 here."""

    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        import os

        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        # MOBI_FUSED_GN=1 routes groupnorm+silu through the Pallas
        # single-pass kernel (A/B knob, see PROFILE.md)
        fused = os.environ.get("MOBI_FUSED_GN", "0") == "1"
        h = GroupNorm(eps=1e-5, dtype=self.dtype, name="in_norm",
                      fuse_silu=fused)(x)
        if not fused:
            h = swish(h)
        h = Conv2d(out_ch, (3, 3), dtype=self.dtype, name="in_conv")(h)
        e = Dense(out_ch, dtype=self.dtype, name="emb_proj")(swish(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm(eps=1e-5, dtype=self.dtype, name="out_norm",
                      fuse_silu=fused)(h)
        if not fused:
            h = swish(h)
        h = Conv2d(out_ch, (3, 3), zero_init=True, dtype=self.dtype, name="out_conv")(h)
        if in_ch != out_ch:
            x = Conv2d(out_ch, (1, 1), dtype=self.dtype, name="skip_connection")(x)
        return x + h


class UNetDownsample(nn.Module):
    """Stride-2 conv with symmetric padding 1 (openaimodel.py:134-160)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Conv2d(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="op",
        )(x)


class UNetUpsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from mobi_tpu.models.layers import upsample_nearest_2x

        x = upsample_nearest_2x(x)
        return Conv2d(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)


class UNetModel(nn.Module):
    """Full UNet (openaimodel.py:528-898), NHWC.

    Input x: [B, H, W, in_channels] (9 = 4 noisy + 4 inpaint latent + 1 mask),
    t: [B] int/float timesteps, context: [B, n_tokens, context_dim].
    When `use_camera and use_lidar`, B is even and interleaved
    [cam0, lid0, cam1, lid1, ...].
    """

    in_channels: int = 9
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    bbox_cond: bool = True
    use_camera: bool = True
    use_lidar: bool = True
    # False: store activations; True: remat every ResBlock + transformer
    # block (reference CheckpointFunction semantics); "transformer": remat
    # only the SpatialTransformer blocks and store ResBlock activations —
    # trades ~2G HBM for skipping the ResBlock recompute in the backward
    # (PROFILE.md remat-scope A/B).
    use_checkpoint: Union[bool, str] = False
    add_conv_in_front_of_unet: bool = False
    attn_backend: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @property
    def multimodal(self) -> bool:
        return self.use_camera and self.use_lidar

    @nn.compact
    def __call__(
        self,
        x: Array,
        timesteps: Array,
        context: Array,
        encoder_cache: Optional[Tuple[Array, ...]] = None,
        return_cache: bool = False,
    ):
        """Forward. With `encoder_cache` (the tuple returned under
        `return_cache=True`), the input/middle blocks are SKIPPED and the
        cached skip activations + middle output are reused — the
        encoder-propagation fast-sampling scheme ("Faster Diffusion",
        arXiv 2312.09608): encoder features change little between adjacent
        denoising steps, so non-key steps only pay for the decoder. The
        decoder still sees the CURRENT timestep embedding and context.
        Opt-in; key-step cadence is chosen by the sampler.
        """
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_0"
        )(t_emb.astype(self.dtype))
        emb = Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_2"
        )(swish(emb))

        # use_checkpoint -> flax remat: recompute each block's activations in
        # the backward pass instead of keeping them in HBM (reference
        # CheckpointFunction, diffusionmodules/util.py:102-149)
        if self.use_checkpoint not in (True, False, "transformer"):
            raise ValueError(
                f"use_checkpoint={self.use_checkpoint!r}: expected True, "
                'False, or "transformer" (a typo here would silently '
                "disable remat and OOM 512-config training)"
            )
        res_block_cls = (
            nn.remat(ResBlock) if self.use_checkpoint is True else ResBlock
        )
        transformer_cls = (
            nn.remat(SpatialTransformer)
            if self.use_checkpoint in (True, "transformer")
            else SpatialTransformer
        )

        def spatial_transformer(ch: int, name: str):
            return transformer_cls(
                heads=self.num_heads,
                dim_head=ch // self.num_heads,
                depth=self.transformer_depth,
                bbox_cond=self.bbox_cond,
                multimodal=self.multimodal,
                attn_backend=self.attn_backend,
                dtype=self.dtype,
                name=name,
            )

        h = x.astype(self.dtype)
        context = context.astype(self.dtype)

        if self.add_conv_in_front_of_unet:
            # Optional pre-UNet feature stack (openaimodel.py:640-661
            # add_resbolck: a 3x3 conv to model_channels + one timestep-
            # conditioned ResBlock). The reference's version is inconsistent
            # (its My_ResBlock tail is hardcoded to 4 output channels and the
            # following input conv still expects in_channels, openaimodel.py
            # :378-390,664) and the flag is off in every shipped config; here
            # the front stack produces model_channels and the UNet input conv
            # consumes it, which is the evidently intended behavior.
            h = Conv2d(
                self.model_channels, (3, 3), dtype=self.dtype,
                name="add_resbolck_0_conv",
            )(h)
            h = ResBlock(
                self.model_channels, dtype=self.dtype, name="add_resbolck_1_res"
            )(h, emb)

        if encoder_cache is None:
            hs = []
            h = Conv2d(
                self.model_channels, (3, 3), dtype=self.dtype,
                name="input_blocks_0_conv",
            )(h)
            hs.append(h)

            ch = self.model_channels
            ds = 1
            block_idx = 1
            for level, mult in enumerate(self.channel_mult):
                for _ in range(self.num_res_blocks):
                    ch = mult * self.model_channels
                    h = res_block_cls(
                        ch, dtype=self.dtype,
                        name=f"input_blocks_{block_idx}_res",
                    )(h, emb)
                    if ds in self.attention_resolutions:
                        h = spatial_transformer(
                            ch, f"input_blocks_{block_idx}_attn"
                        )(h, context)
                    hs.append(h)
                    block_idx += 1
                if level != len(self.channel_mult) - 1:
                    h = UNetDownsample(
                        ch, dtype=self.dtype,
                        name=f"input_blocks_{block_idx}_down",
                    )(h)
                    hs.append(h)
                    block_idx += 1
                    ds *= 2

            h = res_block_cls(dtype=self.dtype, name="middle_block_0")(h, emb)
            h = spatial_transformer(ch, "middle_block_1")(h, context)
            h = res_block_cls(dtype=self.dtype, name="middle_block_2")(h, emb)
        else:
            hs = list(encoder_cache[:-1])
            h = encoder_cache[-1]
            ds = 2 ** (len(self.channel_mult) - 1)
        cache = tuple(hs) + (h,) if return_cache else None

        block_idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = self.model_channels * mult
                h = res_block_cls(
                    ch, dtype=self.dtype, name=f"output_blocks_{block_idx}_res"
                )(h, emb)
                if ds in self.attention_resolutions:
                    h = spatial_transformer(
                        ch, f"output_blocks_{block_idx}_attn"
                    )(h, context)
                if level and i == self.num_res_blocks:
                    h = UNetUpsample(
                        ch, dtype=self.dtype, name=f"output_blocks_{block_idx}_up"
                    )(h)
                    ds //= 2
                block_idx += 1

        import os as _os

        _fused = _os.environ.get("MOBI_FUSED_GN", "0") == "1"
        h = GroupNorm(eps=1e-5, dtype=self.dtype, name="out_norm",
                      fuse_silu=_fused)(h)
        if not _fused:
            h = swish(h)
        h = Conv2d(
            self.out_channels, (3, 3), zero_init=True, dtype=self.dtype,
            name="out_conv",
        )(h)
        out = h.astype(x.dtype)
        if return_cache:
            return out, cache
        return out


class EncoderUNetModel(nn.Module):
    """Half-UNet (encoder trunk + middle block) with a pooled classification
    head — the noisy-latent classifier backbone
    (openaimodel.py:901-1116 EncoderUNetModel; consumed by
    ldm/models/diffusion/classifier.py).

    Pool modes:
      * "adaptive": GN/SiLU -> global mean pool -> zero-init 1x1 conv -> [B,K]
      * "spatial"/"spatial_v2": per-stage spatial means concatenated -> MLP
      * "attention": GN/SiLU -> attention pooling with a learned query token
    """

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    pool: str = "adaptive"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, timesteps: Array) -> Array:
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_0"
        )(t_emb.astype(self.dtype))
        emb = Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_2"
        )(swish(emb))

        h = x.astype(self.dtype)
        pooled = []

        def maybe_pool(h):
            if self.pool.startswith("spatial"):
                pooled.append(h.mean(axis=(1, 2)))

        h = Conv2d(
            self.model_channels, (3, 3), dtype=self.dtype,
            name="input_blocks_0_conv",
        )(h)
        maybe_pool(h)

        ch = self.model_channels
        ds = 1
        block_idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = ResBlock(
                    ch, dtype=self.dtype, name=f"input_blocks_{block_idx}_res"
                )(h, emb)
                if ds in self.attention_resolutions:
                    # encoder trunk uses plain self-attention (no context
                    # conditioning): a SpatialTransformer with self-attn only
                    b, hh, ww, c = h.shape
                    n = GroupNorm(eps=1e-5, dtype=self.dtype,
                                  name=f"input_blocks_{block_idx}_attn_norm")(h)
                    tokens = n.reshape(b, hh * ww, c)
                    att = CrossAttention(
                        heads=self.num_heads, dim_head=c // self.num_heads,
                        dtype=self.dtype,
                        name=f"input_blocks_{block_idx}_attn",
                    )(tokens)
                    h = h + att.reshape(b, hh, ww, c)
                maybe_pool(h)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                h = UNetDownsample(
                    ch, dtype=self.dtype, name=f"input_blocks_{block_idx}_down"
                )(h)
                maybe_pool(h)
                block_idx += 1
                ds *= 2

        h = ResBlock(dtype=self.dtype, name="middle_block_0")(h, emb)
        h = ResBlock(dtype=self.dtype, name="middle_block_2")(h, emb)

        if self.pool.startswith("spatial"):
            pooled.append(h.mean(axis=(1, 2)))
            feats = jnp.concatenate(pooled, axis=-1).astype(jnp.float32)
            feats = Dense(2048, name="out_0")(feats)
            feats = (
                swish(LayerNorm(name="out_norm")(feats))
                if self.pool == "spatial_v2" else nn.relu(feats)
            )
            return Dense(self.out_channels, name="out_2")(feats)

        h = GroupNorm(eps=1e-5, dtype=self.dtype, name="out_norm")(h)
        h = swish(h)
        if self.pool == "attention":
            b, hh, ww, c = h.shape
            tokens = h.reshape(b, hh * ww, c)
            query = self.param(
                "pool_query", nn.initializers.normal(c**-0.5), (1, 1, c)
            ).astype(h.dtype)
            att = CrossAttention(
                heads=self.num_heads, dim_head=c // self.num_heads,
                dtype=self.dtype, name="attention_pool",
            )(jnp.broadcast_to(query, (b, 1, c)), tokens)
            return Dense(self.out_channels, name="attention_pool_proj")(
                att[:, 0].astype(jnp.float32)
            )
        # adaptive: global average pool + zero-init projection
        h = h.mean(axis=(1, 2))
        return Dense(
            self.out_channels, zero_init=True, name="out_proj"
        )(h.astype(jnp.float32))

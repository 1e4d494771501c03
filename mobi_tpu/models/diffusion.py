"""Joint camera+lidar latent diffusion — the MObI flagship model.

Functional re-design of the reference `LatentDiffusion`
(/root/reference/ldm/models/diffusion/ddpm.py:438-1724): instead of a stateful
LightningModule, `MobiDiffusion` holds module *definitions* + the frozen noise
schedule, and exposes pure functions over a single parameter pytree:

  params = {
    "unet":               UNet params (adapters trainable, rest frozen),
    "vae_camera":         camera KL-VAE (frozen),
    "vae_lidar":          range KL-VAE (frozen),
    "cond":               CLIP tower + mapper (frozen) + bbox_embedder (trainable),
    "proj_out":           1024->768 image-token projection (frozen, ddpm.py:479),
    "learnable_vector":   CFG unconditional image token (frozen, ddpm.py:476),
    "bbox_uncond_vector": CFG unconditional bbox token (trainable, ddpm.py:477),
  }

Behavioral contract per reference:
  * encode_all_stages (ddpm.py:1010-1033): VAE-encode GT and inpaint images
    (posterior SAMPLE, scaled by scale_factor), nearest-resize the mask to the
    latent grid, concat to 9 channels.
  * lidar latent alignment (ddpm.py:797-818): center-crop the lidar latent
    width to `latent_size`, pad height symmetrically, and renormalize the
    lidar bbox x/y accordingly.
  * modality interleave (ldm/util.py:213-221): z and cond stacked
    [cam0, lid0, cam1, lid1, ...].
  * conditioning (ddpm.py:610-630): CLIP pooled -> mapper -> final_ln ->
    proj_out 1024->768; bbox fourier token; concat to [B, 2, 768].
  * CFG dropout (ddpm.py:1040-1058): with prob u_cond_percent the WHOLE batch
    conditioning is replaced by (learnable_vector, bbox_uncond_vector).
  * p_losses (ddpm.py:1177-1217): noise only the first 4 latent channels,
    re-concat the 5 conditioning channels, MSE on eps.
  * decode_sample (ddpm.py:1419-1447): de-interleave, undo lidar crop/pad.

All batched tensors are NHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mobi_tpu.models.encoders import CondStageModel
from mobi_tpu.models.unet import UNetModel
from mobi_tpu.models.vae import AutoencoderKL
from mobi_tpu.ops.distributions import DiagonalGaussian
from mobi_tpu.ops.schedules import DiffusionSchedule, SamplerTables

Array = jnp.ndarray
Params = Dict[str, Any]

ADAPTER_SUBSTRINGS = ("cond_adapter", "lidar", "cross_modal")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def adapter_trainable_mask(unet_params) -> Any:
    """Boolean pytree: True where the param path matches the reference's
    adapter trainability rule (ddpm.py:1686-1698)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: any(s in _path_str(p) for s in ADAPTER_SUBSTRINGS),
        unet_params,
    )


def interleave_modalities(tensors: Sequence[Array]) -> Array:
    """[x_a, x_b] (each [B, ...]) -> [a0, b0, a1, b1, ...] ([2B, ...])
    (reference cat_interleave, ldm/util.py:213-221)."""
    stacked = jnp.stack(tensors, axis=1)
    return stacked.reshape((-1,) + stacked.shape[2:])


def deinterleave_modalities(x: Array, n: int = 2) -> Tuple[Array, ...]:
    pair = x.reshape((-1, n) + x.shape[1:])
    return tuple(pair[:, i] for i in range(n))


@dataclasses.dataclass(frozen=True)
class MobiConfig:
    """Mirrors configs/mobi_nusc_512.yaml model params."""

    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    latent_size: int = 64          # `image_size` in the reference model cfg
    channels: int = 4
    scale_factor: float = 0.18215
    lidar_scale_factor: float = 0.18215
    u_cond_percent: float = 0.2
    use_camera: bool = True
    use_lidar: bool = True
    cond_stage_key: Sequence[str] = ("ref_image", "ref_bbox")
    range_object_norm: bool = True
    range_object_norm_scale: float = 0.75
    range_int_norm: bool = True
    parameterization: str = "eps"
    # architecture
    image_height: int = 512
    image_width: int = 512
    range_height: int = 512
    range_width: int = 512
    unet_channels: int = 320
    unet_channel_mult: Sequence[int] = (1, 2, 4, 4)
    unet_num_res_blocks: int = 2
    unet_attention_resolutions: Sequence[int] = (4, 2, 1)
    unet_num_heads: int = 8
    unet_use_checkpoint: "bool | str" = False
    # remat per VAE block (needed to fit VAE training/overfit backwards at
    # 256+ resolution on a 16 GB chip). repr=False: remat never changes
    # parameter values, so param-cache keys (keyed on repr) stay stable.
    vae_use_checkpoint: bool = dataclasses.field(default=False, repr=False)
    attn_backend: str = "auto"
    context_dim: int = 768
    vae_ch: int = 128
    vae_ch_mult: Sequence[int] = (1, 2, 4, 4)
    vae_num_res_blocks: int = 2
    vae_embed_dim: int = 4
    clip_width: int = 1024
    ref_image_size: int = 224
    dtype: Any = jnp.float32

    @property
    def multimodal(self) -> bool:
        return self.use_camera and self.use_lidar

    @property
    def num_modalities(self) -> int:
        return int(self.use_camera) + int(self.use_lidar)


class MobiDiffusion:
    """Module container + pure functions for training and sampling."""

    def __init__(self, config: MobiConfig):
        self.config = config
        self.schedule = DiffusionSchedule.create(
            timesteps=config.timesteps,
            beta_schedule=config.beta_schedule,
            linear_start=config.linear_start,
            linear_end=config.linear_end,
            parameterization=config.parameterization,
        )
        self.unet = UNetModel(
            in_channels=9,
            model_channels=config.unet_channels,
            out_channels=config.channels,
            num_res_blocks=config.unet_num_res_blocks,
            attention_resolutions=tuple(config.unet_attention_resolutions),
            channel_mult=tuple(config.unet_channel_mult),
            num_heads=config.unet_num_heads,
            context_dim=config.context_dim,
            bbox_cond="ref_bbox" in config.cond_stage_key,
            use_camera=config.use_camera,
            use_lidar=config.use_lidar,
            use_checkpoint=config.unet_use_checkpoint,
            attn_backend=config.attn_backend,
            dtype=config.dtype,
        )
        self.vae_camera = (
            AutoencoderKL(
                embed_dim=config.vae_embed_dim,
                ch=config.vae_ch,
                ch_mult=tuple(config.vae_ch_mult),
                num_res_blocks=config.vae_num_res_blocks,
                resolution=config.image_height,
                out_ch=3,
                use_checkpoint=config.vae_use_checkpoint,
                dtype=config.dtype,
            )
            if config.use_camera
            else None
        )
        self.vae_lidar = (
            AutoencoderKL(
                embed_dim=config.vae_embed_dim,
                ch=config.vae_ch,
                ch_mult=tuple(config.vae_ch_mult),
                num_res_blocks=config.vae_num_res_blocks,
                resolution=config.range_height,
                out_ch=2,
                lidar_adapter=True,
                use_checkpoint=config.vae_use_checkpoint,
                dtype=config.dtype,
            )
            if config.use_lidar
            else None
        )
        self.cond_model = CondStageModel(
            conditions=tuple(config.cond_stage_key),
            clip_width=config.clip_width,
            dtype=config.dtype,
        )

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array, on_cpu: bool = True) -> Params:
        """Initialize all parameter trees.

        Initialization runs on CPU by default: it is a one-off, and routing
        the many small init graphs through the TPU compile service costs
        minutes for zero benefit; the training/inference jit moves the
        params to the device/mesh afterwards.
        """
        if self.config.dtype != jnp.float32:
            # flax init EXECUTES the forward pass; with dtype=bf16 that means
            # software-emulated bf16 matmuls on the CPU (tens of minutes on
            # small hosts). Parameter values depend only on shapes, so init a
            # float32 clone instead — identical params, native CPU speed.
            import dataclasses as _dc

            clone = MobiDiffusion(
                _dc.replace(self.config, dtype=jnp.float32)
            )
            try:
                clone.cond_model = self.cond_model.clone(dtype=jnp.float32)
            except Exception:
                clone.cond_model = self.cond_model
            return clone.init_params(rng, on_cpu=on_cpu)
        if on_cpu:
            # local_devices, not devices: on a multi-process runtime the
            # global list starts with process 0's devices, which other
            # processes cannot place computations on (init must be
            # host-local; the mesh placement happens afterwards)
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                return self._init_params_impl(rng)
        return self._init_params_impl(rng)

    def _init_params_impl(self, rng: jax.Array) -> Params:
        cfg = self.config
        keys = jax.random.split(rng, 8)
        b = 2 * cfg.num_modalities
        x = jnp.zeros((b, cfg.latent_size, cfg.latent_size, 9), cfg.dtype)
        t = jnp.zeros((b,), jnp.int32)
        n_tokens = len(cfg.cond_stage_key)
        ctx = jnp.zeros((b, n_tokens, cfg.context_dim), cfg.dtype)
        params: Params = {
            "unet": self.unet.init(keys[0], x, t, ctx)["params"],
            "learnable_vector": jax.random.normal(
                keys[1], (1, 1, cfg.context_dim), jnp.float32
            ),
            "bbox_uncond_vector": jax.random.normal(
                keys[2], (1, 1, cfg.context_dim), jnp.float32
            ),
            "proj_out": {
                "kernel": jax.random.normal(
                    keys[3], (cfg.clip_width, cfg.context_dim), jnp.float32
                )
                * (cfg.clip_width**-0.5),
                "bias": jnp.zeros((cfg.context_dim,), jnp.float32),
            },
        }
        if self.vae_camera is not None:
            img = jnp.zeros((1, cfg.image_height, cfg.image_width, 3), cfg.dtype)
            params["vae_camera"] = self.vae_camera.init(keys[4], img, keys[5])[
                "params"
            ]
        if self.vae_lidar is not None:
            rng_img = jnp.zeros(
                (1, cfg.range_height, cfg.range_width, 2), cfg.dtype
            )
            params["vae_lidar"] = self.vae_lidar.init(keys[6], rng_img, keys[5])[
                "params"
            ]
        cond_in = {}
        if "ref_image" in cfg.cond_stage_key:
            s = cfg.ref_image_size
            cond_in["ref_image"] = jnp.zeros((1, s, s, 3), cfg.dtype)
        if "ref_bbox" in cfg.cond_stage_key:
            cond_in["ref_bbox"] = jnp.zeros((1, 8, 3), cfg.dtype)
        params["cond"] = self.cond_model.init(keys[7], cond_in)["params"]
        return params

    def trainable_mask(self, params: Params) -> Params:
        """Trainable partition: UNet adapters + bbox embedder +
        bbox_uncond_vector (reference ddpm.py:1616-1669).

        MOBI_TRAIN_UNET_FULL=1 marks the WHOLE UNet trainable instead —
        a beyond-reference full-fine-tune mode (the reference hard-codes
        adapter-only training); VAEs and the CLIP tower stay frozen."""
        import os as _os

        mask = jax.tree_util.tree_map(lambda _: False, params)
        if _os.environ.get("MOBI_TRAIN_UNET_FULL", "0") == "1":
            mask["unet"] = jax.tree_util.tree_map(
                lambda _: True, params["unet"]
            )
        else:
            mask["unet"] = adapter_trainable_mask(params["unet"])
        if "cond" in params:
            mask["cond"] = jax.tree_util.tree_map_with_path(
                lambda p, _: "bbox_embedder" in _path_str(p), params["cond"]
            )
        mask["bbox_uncond_vector"] = jax.tree_util.tree_map(
            lambda _: True, params["bbox_uncond_vector"]
        )
        return mask

    # ----------------------------------------------------------- vae stages
    def _encode_stage(
        self, vae: AutoencoderKL, vae_params, x: Array, rng: jax.Array,
        scale: float, deterministic: bool = False,
    ) -> Array:
        posterior = vae.apply({"params": vae_params}, x, method=vae.encode)
        z = posterior.mode() if deterministic else posterior.sample(rng)
        # The reference DETACHES first-stage encodings (ddpm.py:531,1015:
        # `get_first_stage_encoding(...).detach()` under @torch.no_grad) —
        # latents are data, never a gradient path. stop_gradient is the
        # same semantics and a hard memory requirement here: without it,
        # a remat'd (use_checkpoint) VAE encode is recomputed INSIDE the
        # UNet backward and its temps land on the backward's peak
        # (mini-256 full-UNet step: 16.33 GB > 15.75 GB HBM, measured).
        return jax.lax.stop_gradient(scale * z)

    def _encode_triplet(
        self, vae, vae_params, gt, inpaint, mask, rng, scale,
        deterministic: bool = False,
    ) -> Array:
        """(GT, inpaint, mask) -> 9ch latent (ddpm.py:1010-1031)."""
        k1, k2 = jax.random.split(rng)
        z = self._encode_stage(vae, vae_params, gt, k1, scale, deterministic)
        z_inpaint = self._encode_stage(
            vae, vae_params, inpaint, k2, scale, deterministic
        )
        h, w = z.shape[1], z.shape[2]
        # torch F.interpolate(mode="nearest") picks floor(i * in/out), NOT
        # the centered-rounding jax.image.resize uses — index explicitly so
        # the mask channel matches the reference bit-for-bit
        ridx = jnp.arange(h) * mask.shape[1] // h
        cidx = jnp.arange(w) * mask.shape[2] // w
        mask_resized = mask[:, ridx][:, :, cidx]
        return jnp.concatenate([z, z_inpaint, mask_resized.astype(z.dtype)], axis=-1)

    def align_lidar_latent(
        self, z_lidar: Array, ref_bbox: Array
    ) -> Tuple[Array, Array, Dict[str, int]]:
        """Center-crop lidar latent width to latent_size, pad height, and
        renormalize the lidar bbox (ddpm.py:797-818).

        Returns (aligned latent, adjusted bbox, geometry dict for undo).
        """
        size = self.config.latent_size
        W = z_lidar.shape[2]
        H = z_lidar.shape[1]
        left = W // 2 - size // 2
        right = W // 2 + size // 2
        pad = (size - H) // 2
        z = z_lidar[:, :, left:right, :]
        if pad >= 0:
            z = jnp.pad(z, ((0, 0), (pad, size - H - pad), (0, 0), (0, 0)))
        else:
            # torch F.pad with negative pad crops; replicate that
            z = z[:, -pad : -pad + size, :, :]
        bbox = ref_bbox
        bbox = bbox.at[..., 0].set((bbox[..., 0] * W - left) / size)
        bbox = bbox.at[..., 1].add(pad / size)
        geom = {"W": W, "H": H, "left": left, "pad": pad}
        return z, bbox, geom

    def lidar_latent_geometry(self, z_lidar_full_shape) -> Dict[str, int]:
        """The static geometry dict `align_lidar_latent` would return for a
        full lidar latent of this shape — pure shape math, recomputable
        without re-running the alignment (pipeline VAE chunking keeps the
        dict out of `lax.map`-carried pytrees because its values are Python
        ints, not arrays)."""
        size = self.config.latent_size
        H, W = z_lidar_full_shape[1], z_lidar_full_shape[2]
        return {
            "W": W, "H": H,
            "left": W // 2 - size // 2,
            "pad": (size - H) // 2,
        }

    # --------------------------------------------------------- conditioning
    def get_learned_conditioning(
        self, params: Params, cond: Dict[str, Array]
    ) -> Array:
        """cond dict -> [B, n_tokens, 768] (ddpm.py:610-630)."""
        tokens = []
        enc = self.cond_model.apply({"params": params["cond"]}, cond)
        if "ref_image" in self.config.cond_stage_key:
            img_tok = enc["ref_image_token"]
            img_tok = (
                img_tok @ params["proj_out"]["kernel"] + params["proj_out"]["bias"]
            )
            tokens.append(img_tok)
        if "ref_bbox" in self.config.cond_stage_key:
            tokens.append(enc["ref_bbox_token"])
        return jnp.concatenate(tokens, axis=1)

    def uncond_tokens(self, params: Params, batch: int) -> Array:
        """CFG unconditional tokens (ddpm.py:1052-1056)."""
        toks = [jnp.tile(params["learnable_vector"], (batch, 1, 1))]
        if "ref_bbox" in self.config.cond_stage_key:
            toks.append(jnp.tile(params["bbox_uncond_vector"], (batch, 1, 1)))
        return jnp.concatenate(toks, axis=1).astype(self.config.dtype)

    # -------------------------------------------------------------- get_input
    def get_input(
        self,
        params: Params,
        batch: Dict[str, Any],
        rng: jax.Array,
        encode_cond: bool = False,
        deterministic: bool = False,
    ) -> Dict[str, Any]:
        """Batch dict -> interleaved latents + conditioning (ddpm.py:757-834).

        `deterministic=True` encodes with the posterior MODE instead of a
        sample — bit-reproducible latents for eval/parity.

        Expects the NuScenes batch schema (NHWC):
          batch["image"]: {GT, inpaint_image, inpaint_mask [B,H,W,*],
                           cond: {ref_image [B,224,224,3], ref_bbox [B,8,3]}}
          batch["lidar"]: {range_data, range_data_inpaint, range_mask,
                           cond: {ref_bbox [B,8,3]}}
        """
        cfg = self.config
        k_img, k_lid = jax.random.split(rng)
        out: Dict[str, Any] = {}
        zs, conds = [], []

        if cfg.use_camera:
            img = batch["image"]
            z_image = self._encode_triplet(
                self.vae_camera, params["vae_camera"], img["GT"],
                img["inpaint_image"], img["inpaint_mask"], k_img,
                cfg.scale_factor, deterministic,
            )
            zs.append(z_image)
            conds.append(dict(img["cond"]))

        if cfg.use_lidar:
            lid = batch["lidar"]
            z_lidar_full = self._encode_triplet(
                self.vae_lidar, params["vae_lidar"], lid["range_data"],
                lid["range_data_inpaint"], lid["range_mask"], k_lid,
                cfg.lidar_scale_factor, deterministic,
            )
            lidar_cond = dict(lid["cond"])
            if "ref_image" in cfg.cond_stage_key and "ref_image" not in lidar_cond:
                # lidar rows share the camera reference crop (dataset contract)
                lidar_cond["ref_image"] = batch["image"]["cond"]["ref_image"]
            z_lidar, bbox, geom = self.align_lidar_latent(
                z_lidar_full, lidar_cond.get("ref_bbox")
            )
            if bbox is not None:
                lidar_cond["ref_bbox"] = bbox
            zs.append(z_lidar)
            conds.append(lidar_cond)
            out["z_lidar_full"] = z_lidar_full[..., :4]
            out["lidar_geom"] = geom

        out["z"] = interleave_modalities(zs) if len(zs) > 1 else zs[0]
        cond_keys = conds[0].keys()
        merged = {
            k: (
                interleave_modalities([c[k] for c in conds])
                if len(conds) > 1
                else conds[0][k]
            )
            for k in cond_keys
        }
        if encode_cond:
            out["cond"] = self.get_learned_conditioning(params, merged)
        else:
            out["cond_raw"] = merged
        return out

    # ------------------------------------------------------------- denoiser
    def apply_model(
        self, params: Params, x9: Array, t: Array, context: Array,
        encoder_cache=None, return_cache: bool = False,
    ) -> Array:
        return self.unet.apply(
            {"params": params["unet"]}, x9, t, context,
            encoder_cache=encoder_cache, return_cache=return_cache,
        )

    # ----------------------------------------------------------------- loss
    def p_losses(
        self,
        params: Params,
        z: Array,
        context: Array,
        t: Array,
        rng: jax.Array,
        noise: Array | None = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """eps-MSE on the first 4 channels (ddpm.py:1177-1217). Explicit
        `noise` overrides the rng draw (parity/debugging, like the
        reference's noise kwarg)."""
        if noise is None:
            noise = jax.random.normal(rng, z[..., :4].shape, dtype=z.dtype)
        x_noisy = self.schedule.q_sample(z[..., :4], t, noise)
        x9 = jnp.concatenate([x_noisy, z[..., 4:]], axis=-1)
        eps = self.apply_model(params, x9, t, context)
        err = (eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        loss_simple = err.mean(axis=(1, 2, 3))
        loss = loss_simple.mean()
        loss_vlb = (self.schedule.lvlb_weights[t] * loss_simple).mean()
        metrics = {
            "loss": loss,
            "loss_simple": loss_simple.mean(),
            "loss_vlb": loss_vlb,
        }
        if self.config.multimodal:
            # per-modality split of the joint eps-MSE: the interleaved batch
            # is [cam0, lid0, cam1, lid1, ...] (interleave_modalities), so
            # even rows are camera, odd rows lidar. Diagnostic only (the
            # trained loss stays the joint mean, matching the reference's
            # single mean over the interleaved batch, ddpm.py:1198-1215) —
            # exposes which modality an asymmetric plateau lives in.
            metrics["loss_camera"] = loss_simple[0::2].mean()
            metrics["loss_lidar"] = loss_simple[1::2].mean()
        return loss, metrics

    def training_loss(
        self, params: Params, batch: Dict[str, Any], rng: jax.Array
    ) -> Tuple[Array, Dict[str, Array]]:
        """Full shared_step: encode stages, conditioning (trainable path),
        whole-batch CFG dropout, p_losses (ddpm.py:1035-1058)."""
        cfg = self.config
        k_in, k_t, k_drop, k_noise = jax.random.split(rng, 4)
        data = self.get_input(params, batch, k_in, encode_cond=False)
        z = data["z"]
        b = z.shape[0]
        t = jax.random.randint(k_t, (b,), 0, cfg.timesteps)
        context = self.get_learned_conditioning(params, data["cond_raw"])
        drop = jax.random.uniform(k_drop, ()) < cfg.u_cond_percent
        context = jnp.where(drop, self.uncond_tokens(params, b), context)
        return self.p_losses(params, z, context, t, k_noise)

    # -------------------------------------------------------------- sampling
    def sample(
        self,
        params: Params,
        data: Dict[str, Any],
        rng: jax.Array,
        num_steps: int = 50,
        guidance_scale: float = 5.0,
        sampler: str = "plms",
        eta: float = 0.0,
        encoder_interval: int = 1,
        x_T: Array | None = None,
    ) -> Array:
        """Sample latents given encoded `data` from get_input(encode_cond=True).

        `x_T` overrides the initial noise draw (parity/reproducibility —
        the reference samplers accept the same kwarg).

        `encoder_interval > 1` (ddim only) turns on encoder propagation —
        see samplers.ddim_sample; approximate, off by default.

        Returns interleaved [B*, h, w, 4] latents.
        """
        from mobi_tpu.models import samplers as S

        cfg = self.config
        tables = (
            SamplerTables.create(self.schedule, num_steps, eta=eta)
            if sampler in ("plms", "ddim") else None
        )
        z = data["z"]
        rest = z[..., 4:]
        cond = data["cond"]
        b = z.shape[0]
        uncond = (
            self.uncond_tokens(params, b) if guidance_scale != 1.0 else None
        )
        k_init, k_loop = jax.random.split(rng)
        # the sampling carry stays float32 (schedule math is fp32; the UNet
        # casts its inputs to the activation dtype internally) — mixing a
        # bf16 carry with fp32 step tables would change dtype across the scan
        if x_T is None:
            x_T = jax.random.normal(k_init, z[..., :4].shape, dtype=jnp.float32)
        else:
            x_T = x_T.astype(jnp.float32)

        def model_fn(x9, t, ctx):
            return self.apply_model(params, x9, t, ctx)

        def cached_model_fn(x9, t, ctx, cache, return_cache):
            return self.apply_model(
                params, x9, t, ctx, encoder_cache=cache,
                return_cache=return_cache,
            )

        if sampler == "plms":
            return S.plms_sample(
                model_fn, tables, x_T, cond, rest, uncond, guidance_scale
            )
        elif sampler == "ddim":
            return S.ddim_sample(
                model_fn, tables, k_loop, x_T, cond, rest, uncond,
                guidance_scale,
                encoder_interval=encoder_interval,
                cached_model_fn=cached_model_fn,
            )
        elif sampler == "ddpm":
            # full-length ancestral loop (reference ddpm.py:253-282); latents
            # are not pixel-ranged, so no x0 clipping here
            return S.ddpm_sample(
                model_fn, self.schedule, k_loop, x_T, cond, rest, uncond,
                guidance_scale, clip_denoised=False,
            )
        raise ValueError(f"unknown sampler {sampler}")

    def decode_sample(
        self,
        params: Params,
        sample: Array,
        z_lidar_full: Optional[Array] = None,
        lidar_geom: Optional[Dict[str, int]] = None,
    ) -> Dict[str, Array]:
        """De-interleave and VAE-decode both modalities (ddpm.py:1419-1447,
        1470-1505)."""
        cfg = self.config
        out: Dict[str, Array] = {}
        if cfg.multimodal:
            h_camera, h_lidar = deinterleave_modalities(sample)
        elif cfg.use_camera:
            h_camera, h_lidar = sample, None
        else:
            h_camera, h_lidar = None, sample

        if h_lidar is not None and lidar_geom is not None:
            H, left = lidar_geom["H"], lidar_geom["left"]
            bottom = (h_lidar.shape[1] - H) // 2
            h_lidar_crop = h_lidar[:, bottom : bottom + H, :, :]
            if z_lidar_full is not None and z_lidar_full.shape[2] != h_lidar.shape[2]:
                size = cfg.latent_size
                h_lidar = jax.lax.dynamic_update_slice(
                    z_lidar_full, h_lidar_crop, (0, 0, left, 0)
                )
            else:
                h_lidar = h_lidar_crop

        if h_camera is not None:
            dec = self.vae_camera.apply(
                {"params": params["vae_camera"]},
                h_camera / cfg.scale_factor,
                method=self.vae_camera.decode,
            )
            out["camera"] = jnp.clip(dec, -1.0, 1.0)
        if h_lidar is not None:
            dec = self.vae_lidar.apply(
                {"params": params["vae_lidar"]},
                h_lidar / cfg.lidar_scale_factor,
                method=self.vae_lidar.decode,
            )
            out["lidar"] = jnp.clip(dec, -1.0, 1.0)
        return out

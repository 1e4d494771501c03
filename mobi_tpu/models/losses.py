"""VAE training losses: L1 + NLL-logvar + KL + adaptive-weight hinge GAN.

Functional counterpart of the reference losses
(/root/reference/ldm/modules/losses/lidarperceptual.py:7-105 for the range
VAE; contperceptual.py adds LPIPS for the camera VAE) and the PatchGAN
discriminator from taming-transformers (NLayerDiscriminator).

JAX design: instead of torch's `optimizer_idx` double-forward, the trainer
calls `generator_loss` and `discriminator_loss` as two pure functions; the
adaptive GAN weight ||d nll/d last|| / ||d g/d last|| is computed with
jax.grad against the decoder's final conv kernel.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming-transformers layout), NHWC."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kw, pad = 4, ((1, 1), (1, 1))
        h = nn.Conv(self.ndf, (kw, kw), strides=(2, 2), padding=pad,
                    dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for i in range(1, self.n_layers):
            nf = min(2**i, 8)
            h = nn.Conv(self.ndf * nf, (kw, kw), strides=(2, 2), padding=pad,
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=None, group_size=1, name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (kw, kw), strides=(1, 1), padding=pad,
                    use_bias=False, dtype=self.dtype, name=f"conv{self.n_layers}")(h)
        h = nn.GroupNorm(num_groups=None, group_size=1,
                         name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (kw, kw), padding=pad, dtype=self.dtype,
                       name="conv_out")(h)


def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (
        jnp.mean(nn.softplus(-logits_real)) + jnp.mean(nn.softplus(logits_fake))
    )


def adopt_weight(weight: float, global_step: Array, threshold: int) -> Array:
    return jnp.where(global_step < threshold, 0.0, weight)


class LidarWithDiscriminator:
    """Loss container; params = {"logvar": scalar, "discriminator": tree}."""

    def __init__(
        self,
        disc_start: int,
        logvar_init: float = 0.0,
        kl_weight: float = 1.0,
        pixelloss_weight: float = 1.0,
        disc_num_layers: int = 3,
        disc_in_channels: int = 3,
        disc_factor: float = 1.0,
        disc_weight: float = 1.0,
        disc_loss: str = "hinge",
        **_,
    ):
        self.disc_start = disc_start
        self.logvar_init = logvar_init
        self.kl_weight = kl_weight
        self.pixel_weight = pixelloss_weight
        self.disc_factor = disc_factor
        self.disc_weight = disc_weight
        self.d_loss_fn = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.discriminator = NLayerDiscriminator(
            n_layers=disc_num_layers
        )
        self.disc_in_channels = disc_in_channels

    def init_params(self, rng: jax.Array, spatial: int = 64) -> Dict[str, Any]:
        x = jnp.zeros((1, spatial, spatial, self.disc_in_channels))
        return {
            "logvar": jnp.asarray(self.logvar_init, jnp.float32),
            "discriminator": self.discriminator.init(rng, x)["params"],
        }

    def nll_and_kl(self, loss_params, inputs, recons, posterior):
        rec = jnp.abs(inputs - recons)
        logvar = loss_params["logvar"]
        nll = rec / jnp.exp(logvar) + logvar
        nll = jnp.sum(nll) / inputs.shape[0]
        kl = jnp.sum(posterior.kl()) / inputs.shape[0]
        return nll, kl, rec.mean()

    def generator_loss(
        self,
        loss_params: Dict[str, Any],
        inputs: Array,
        recons: Array,
        posterior,
        global_step: Array,
        last_layer_grads: Optional[Tuple[Array, Array]] = None,
        split: str = "train",
    ) -> Tuple[Array, Dict[str, Array]]:
        """last_layer_grads: (d nll / d last_kernel, d g / d last_kernel)
        computed by the trainer for the adaptive weight; None disables it
        (eval mode, matching the reference's RuntimeError fallback)."""
        nll, kl, rec_mean = self.nll_and_kl(loss_params, inputs, recons, posterior)
        logits_fake = self.discriminator.apply(
            {"params": loss_params["discriminator"]}, recons
        )
        g_loss = -jnp.mean(logits_fake)

        if last_layer_grads is not None and self.disc_factor > 0:
            nll_g, gan_g = last_layer_grads
            d_weight = jnp.linalg.norm(nll_g) / (jnp.linalg.norm(gan_g) + 1e-4)
            d_weight = jax.lax.stop_gradient(
                jnp.clip(d_weight, 0.0, 1e4) * self.disc_weight
            )
        else:
            d_weight = jnp.asarray(0.0)

        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        loss = nll + self.kl_weight * kl + d_weight * disc_factor * g_loss
        log = {
            f"{split}/total_loss": loss,
            f"{split}/logvar": loss_params["logvar"],
            f"{split}/kl_loss": kl,
            f"{split}/nll_loss": nll,
            f"{split}/rec_loss": rec_mean,
            f"{split}/d_weight": d_weight,
            f"{split}/disc_factor": disc_factor,
            f"{split}/g_loss": g_loss,
        }
        return loss, log

    def discriminator_loss(
        self,
        loss_params: Dict[str, Any],
        inputs: Array,
        recons: Array,
        global_step: Array,
        split: str = "train",
    ) -> Tuple[Array, Dict[str, Array]]:
        logits_real = self.discriminator.apply(
            {"params": loss_params["discriminator"]},
            jax.lax.stop_gradient(inputs),
        )
        logits_fake = self.discriminator.apply(
            {"params": loss_params["discriminator"]},
            jax.lax.stop_gradient(recons),
        )
        disc_factor = adopt_weight(self.disc_factor, global_step, self.disc_start)
        d_loss = disc_factor * self.d_loss_fn(logits_real, logits_fake)
        log = {
            f"{split}/disc_loss": d_loss,
            f"{split}/logits_real": logits_real.mean(),
            f"{split}/logits_fake": logits_fake.mean(),
        }
        return d_loss, log


class LPIPSWithDiscriminator(LidarWithDiscriminator):
    """Camera-VAE loss (reference contperceptual.py:7-105): the lidar loss
    plus an AlexNet-LPIPS perceptual term added into the reconstruction
    residual BEFORE the logvar NLL (p_loss broadcast per sample).

    params adds {"lpips": <frozen feature/linear-head tree>}; import real
    weights with `mobi_tpu.eval.lpips.import_lpips_weights` — random init is
    used otherwise (fine for shape tests, not for training).
    """

    def __init__(self, *args, perceptual_weight: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.perceptual_weight = perceptual_weight
        from mobi_tpu.eval.lpips import LPIPS

        self.lpips = LPIPS()

    def init_params(self, rng: jax.Array, spatial: int = 64) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)
        params = super().init_params(k1, spatial)
        if self.perceptual_weight > 0:
            x = jnp.zeros((1, max(spatial, 64), max(spatial, 64), 3))
            params["lpips"] = self.lpips.init(k2, x, x)["params"]
        return params

    def nll_and_kl(self, loss_params, inputs, recons, posterior):
        rec = jnp.abs(inputs - recons)
        if self.perceptual_weight > 0:
            # frozen perceptual net: gradients flow to the decoder through
            # the activations, never into the LPIPS weights
            lpips_params = jax.lax.stop_gradient(loss_params["lpips"])
            p = self.lpips.apply({"params": lpips_params}, inputs, recons)
            rec = rec + self.perceptual_weight * p[:, None, None, None]
        logvar = loss_params["logvar"]
        nll = rec / jnp.exp(logvar) + logvar
        nll = jnp.sum(nll) / inputs.shape[0]
        kl = jnp.sum(posterior.kl()) / inputs.shape[0]
        return nll, kl, rec.mean()

"""Noisy-latent classifier (legacy LDM surface).

Equivalent of /root/reference/ldm/models/diffusion/classifier.py
(NoisyLatentImageClassifier): train an EncoderUNetModel to predict the class
label of a VAE latent after it has been diffused to a random timestep — the
classifier-guidance recipe. The reference wraps a frozen LatentDiffusion for
`q_sample`; here the forward-diffusion tables come from `DiffusionSchedule`
directly (same buffers), so the classifier trains without instantiating the
whole generative model.

Not on the MObI path (no shipped config uses it); provided for LDM API
completeness, jit-first: `make_classifier_train_step` returns a pure jitted
step over (params, opt_state, z0, labels, rng).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from mobi_tpu.models.unet import EncoderUNetModel
from mobi_tpu.ops.schedules import DiffusionSchedule

Array = jnp.ndarray


@dataclasses.dataclass
class NoisyLatentClassifier:
    """EncoderUNetModel over q-sampled latents (classifier.py:28-205)."""

    num_classes: int
    in_channels: int = 4
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4,)
    pool: str = "attention"
    num_timesteps: int = 1000

    def __post_init__(self):
        self.model = EncoderUNetModel(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.num_classes,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            pool=self.pool,
        )
        self.schedule = DiffusionSchedule.create(timesteps=self.num_timesteps)

    def init_params(self, rng: jax.Array, latent_size: int = 32):
        z = jnp.zeros((1, latent_size, latent_size, self.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        return self.model.init(rng, z, t)["params"]

    def loss(
        self,
        params,
        z0: Array,
        labels: Array,
        rng: jax.Array,
        t: Array | None = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Cross-entropy of the classifier on q_sample(z0, t).

        t defaults to uniform draws in [0, num_timesteps) — the reference's
        `get_noisy_input`/`shared_step` (classifier.py:115-147).
        """
        k_t, k_n = jax.random.split(rng)
        b = z0.shape[0]
        if t is None:
            t = jax.random.randint(k_t, (b,), 0, self.num_timesteps)
        noise = jax.random.normal(k_n, z0.shape, z0.dtype)
        zt = self.schedule.q_sample(z0, t, noise)
        logits = self.model.apply({"params": params}, zt, t)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        acc = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        return ce.mean(), {
            "loss": ce.mean(),
            "accuracy": acc.mean(),
            "t_mean": t.astype(jnp.float32).mean(),
        }


def make_classifier_train_step(
    clf: NoisyLatentClassifier, tx: optax.GradientTransformation
) -> Callable:
    """Jitted AdamW-style step (reference configure_optimizers,
    classifier.py:222-231)."""

    @jax.jit
    def step(params, opt_state, z0, labels, rng):
        (loss, metrics), grads = jax.value_and_grad(clf.loss, has_aux=True)(
            params, z0, labels, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step

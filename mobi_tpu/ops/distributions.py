"""Diagonal Gaussian posterior used by the KL-VAEs.

Functional counterpart of the reference's
/root/reference/ldm/modules/distributions/distributions.py:24-82. Channel
axis is configurable because mobi_tpu uses NHWC layouts (channels last) while
the reference is NCHW.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    mean: Array
    logvar: Array

    @classmethod
    def from_moments(cls, moments: Array, channel_axis: int = -1) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=channel_axis)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar)

    # pytree protocol: lets posteriors cross jit / checkpoint / scan
    # boundaries (e.g. rematerialized VAE training steps)
    def tree_flatten(self):
        return (self.mean, self.logvar), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(mean=children[0], logvar=children[1])

    @property
    def std(self) -> Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> Array:
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> Array:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> Array:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None, axes=(1, 2, 3)) -> Array:
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: Array, axes=(1, 2, 3)) -> Array:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two Gaussians with broadcasting."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )

"""VAE loss stack: PatchGAN discriminator, hinge/vanilla losses, the lidar
L1+KL+GAN loss, and the camera LPIPS-augmented variant
(reference lidarperceptual.py:7-105, contperceptual.py:7-105)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.losses import (
    LidarWithDiscriminator,
    LPIPSWithDiscriminator,
    NLayerDiscriminator,
    adopt_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
from mobi_tpu.ops.distributions import DiagonalGaussian


def make_posterior(rng, b=2, h=8, w=8, c=4):
    moments = jax.random.normal(rng, (b, h, w, 2 * c))
    return DiagonalGaussian.from_moments(moments, channel_axis=-1)


def test_discriminator_patch_output():
    disc = NLayerDiscriminator(ndf=8, n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    params = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(params, x)
    # 3 stride-2 convs: 64 -> 8 patches (+ boundary effects from pad=1, k=4)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert 6 <= out.shape[1] <= 9


def test_hinge_and_vanilla_losses():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(-real, -fake)) == 3.0
    assert float(vanilla_d_loss(real, fake)) < float(vanilla_d_loss(fake, real))


def test_adopt_weight_gates_on_step():
    assert float(adopt_weight(1.0, jnp.asarray(10), threshold=50)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(60), threshold=50)) == 1.0


@pytest.fixture(scope="module")
def lidar_loss_setup():
    loss = LidarWithDiscriminator(disc_start=0, disc_in_channels=2, kl_weight=1e-6)
    params = loss.init_params(jax.random.PRNGKey(0), spatial=32)
    return loss, params


def test_lidar_generator_and_disc_losses(lidar_loss_setup):
    loss, params = lidar_loss_setup
    rng = jax.random.PRNGKey(1)
    inputs = jax.random.normal(rng, (2, 32, 32, 2))
    recons = inputs + 0.1
    post = make_posterior(jax.random.PRNGKey(2))
    g, log = loss.generator_loss(params, inputs, recons, post, jnp.asarray(100))
    assert np.isfinite(float(g))
    assert float(log["train/rec_loss"]) == pytest.approx(0.1, rel=1e-4)
    d, dlog = loss.discriminator_loss(params, inputs, recons, jnp.asarray(100))
    assert np.isfinite(float(d))


@pytest.fixture(scope="module")
def camera_loss_setup():
    loss = LPIPSWithDiscriminator(
        disc_start=0, disc_in_channels=3, kl_weight=1e-6, perceptual_weight=1.0
    )
    params = loss.init_params(jax.random.PRNGKey(0), spatial=64)
    return loss, params


def test_lpips_loss_has_perceptual_term(camera_loss_setup):
    """The camera loss is NOT the lidar loss: the LPIPS term must contribute
    (VERDICT round-1 item 5: the alias dropped contperceptual.py's
    perceptual term)."""
    loss, params = camera_loss_setup
    assert "lpips" in params
    rng = jax.random.PRNGKey(3)
    inputs = jnp.clip(jax.random.normal(rng, (2, 64, 64, 3)) * 0.3, -1, 1)
    recons = jnp.clip(inputs + 0.2 * jax.random.normal(jax.random.PRNGKey(4), inputs.shape), -1, 1)
    post = make_posterior(jax.random.PRNGKey(5), h=16, w=16)

    nll_with, _, _ = loss.nll_and_kl(params, inputs, recons, post)
    saved = loss.perceptual_weight
    loss.perceptual_weight = 0.0
    nll_without, _, _ = loss.nll_and_kl(params, inputs, recons, post)
    loss.perceptual_weight = saved
    assert float(nll_with) != pytest.approx(float(nll_without))

    # identical recon -> perceptual term ~0, L1 0
    nll_same, _, rec_mean = loss.nll_and_kl(params, inputs, inputs, post)
    assert float(rec_mean) == pytest.approx(0.0, abs=1e-5)


def test_lpips_params_receive_no_gradient(camera_loss_setup):
    loss, params = camera_loss_setup
    inputs = jnp.clip(jax.random.normal(jax.random.PRNGKey(6), (1, 64, 64, 3)), -1, 1)
    recons = jnp.clip(inputs * 0.8, -1, 1)
    post = make_posterior(jax.random.PRNGKey(7), b=1, h=16, w=16)

    def f(p):
        nll, kl, _ = loss.nll_and_kl(p, inputs, recons, post)
        return nll

    grads = jax.grad(f)(params)
    lpips_gnorm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["lpips"])
    )
    assert lpips_gnorm == 0.0, "LPIPS net must stay frozen"
    # ...but the reconstruction DOES get a perceptual gradient
    g_rec = jax.grad(
        lambda r: loss.nll_and_kl(params, inputs, r, post)[0]
    )(recons)
    assert float(jnp.abs(g_rec).sum()) > 0

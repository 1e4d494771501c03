import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.ops.distributions import DiagonalGaussian, normal_kl


def test_moment_split_and_clip():
    moments = jnp.concatenate(
        [jnp.zeros((2, 8, 8, 4)), jnp.full((2, 8, 8, 4), -100.0)], axis=-1
    )
    d = DiagonalGaussian.from_moments(moments)
    assert d.mean.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(d.logvar), -30.0)  # clipped


def test_mode_and_sample_stats():
    rng = jax.random.PRNGKey(0)
    mean = jnp.full((1, 4, 4, 2), 3.0)
    logvar = jnp.full((1, 4, 4, 2), jnp.log(0.25))
    d = DiagonalGaussian(mean=mean, logvar=logvar)
    np.testing.assert_allclose(np.asarray(d.mode()), 3.0)
    samples = jnp.stack([d.sample(k) for k in jax.random.split(rng, 500)])
    assert abs(float(samples.mean()) - 3.0) < 0.05
    assert abs(float(samples.std()) - 0.5) < 0.05


def test_kl_standard_normal_zero():
    d = DiagonalGaussian(mean=jnp.zeros((1, 2, 2, 2)), logvar=jnp.zeros((1, 2, 2, 2)))
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-7)


def test_kl_matches_closed_form():
    mean = jnp.full((1, 1, 1, 1), 0.5)
    logvar = jnp.full((1, 1, 1, 1), jnp.log(2.0))
    d = DiagonalGaussian(mean=mean, logvar=logvar)
    expected = 0.5 * (0.25 + 2.0 - 1.0 - np.log(2.0))
    np.testing.assert_allclose(np.asarray(d.kl()), expected, rtol=1e-6)


def test_normal_kl_symmetric_zero():
    v = normal_kl(1.0, 0.3, 1.0, 0.3)
    np.testing.assert_allclose(float(v), 0.0, atol=1e-7)

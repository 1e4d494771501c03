import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.vae import AutoencoderKL

SMALL = dict(ch=16, ch_mult=(1, 2), num_res_blocks=1, resolution=32, z_channels=4)


@pytest.fixture(scope="module")
def camera_vae():
    vae = AutoencoderKL(embed_dim=4, out_ch=3, **SMALL)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    return vae, params


def test_encode_shapes(camera_vae):
    vae, params = camera_vae
    x = jnp.ones((2, 32, 32, 3))
    posterior = vae.apply(params, x, method=vae.encode)
    f = vae.downsample_factor
    assert f == 2
    assert posterior.mean.shape == (2, 32 // f, 32 // f, 4)
    assert posterior.logvar.shape == posterior.mean.shape


def test_decode_shapes(camera_vae):
    vae, params = camera_vae
    z = jnp.zeros((2, 16, 16, 4))
    out = vae.apply(params, z, method=vae.decode)
    assert out.shape == (2, 32, 32, 3)


def test_full_pass_deterministic_mode(camera_vae):
    vae, params = camera_vae
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    y1, p1 = vae.apply(params, x, jax.random.PRNGKey(3), sample_posterior=False)
    y2, p2 = vae.apply(params, x, jax.random.PRNGKey(4), sample_posterior=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0)


def test_lidar_adapter_structure_and_shapes():
    vae = AutoencoderKL(embed_dim=4, out_ch=2, lidar_adapter=True, **SMALL)
    x = jnp.zeros((1, 32, 32, 2))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    # adapter params must carry the "lidar" substring for the finetune
    # partition (reference autoencoder.py:128-143)
    assert any("conv_in_lidar" in n for n in names)
    assert any("res_block_lidar1" in n for n in names)
    assert any("conv_out_lidar" in n for n in names)
    assert any("norm_out_lidar2" in n for n in names)
    assert not any("/conv_in/" in n and "lidar" not in n for n in names if "encoder" in n)
    y, post = vae.apply(params, x, jax.random.PRNGKey(2), sample_posterior=False)
    assert y.shape == (1, 32, 32, 2)


def test_8x_downsampling_512_config():
    """MObI config: f=8 VAE, 512 -> 64 latent (mobi_nusc_512.yaml:84-103)."""
    vae = AutoencoderKL(
        embed_dim=4, ch=8, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
        resolution=64, z_channels=4, out_ch=3,
    )
    assert vae.downsample_factor == 8
    x = jnp.zeros((1, 64, 64, 3))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    post = vae.apply(params, x, method=vae.encode)
    assert post.mean.shape == (1, 8, 8, 4)


def test_kl_sampling_uses_rng():
    vae = AutoencoderKL(embed_dim=4, out_ch=3, **SMALL)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    post = vae.apply(params, x, method=vae.encode)
    s1 = post.sample(jax.random.PRNGKey(1))
    s2 = post.sample(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_vae_remat_identical_params_and_outputs():
    """vae_use_checkpoint (MobiConfig -> AutoencoderKL use_checkpoint)
    rematerializes per block without changing the parameter tree, forward
    outputs, or the param-cache key (MobiConfig repr) — it is pure memory/
    compute trade, needed to fit VAE training backwards at 256^2 on a
    16 GB chip (scripts/overfit_oracle_drive.py)."""
    import dataclasses

    from mobi_tpu.models.diffusion import MobiConfig

    assert "vae_use_checkpoint" not in repr(MobiConfig())
    assert repr(MobiConfig(vae_use_checkpoint=True)) == repr(MobiConfig())

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 2))
    outs, trees = [], []
    for remat in (False, True):
        vae = AutoencoderKL(
            embed_dim=4, out_ch=2, lidar_adapter=True,
            use_checkpoint=remat, **SMALL,
        )
        params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        trees.append(params)
        y, _ = vae.apply(params, x, jax.random.PRNGKey(3),
                         sample_posterior=False)
        outs.append(np.asarray(y))

        def loss(p, vae=vae):
            post = vae.apply(p, x, method=vae.encode)
            rec = vae.apply(p, post.mode(), method=vae.decode)
            return jnp.abs(rec - x).mean()

        g = jax.grad(loss)(params)
        assert all(
            bool(jnp.isfinite(l).all())
            for l in jax.tree_util.tree_leaves(g)
        )
    a, b = (jax.tree_util.tree_leaves(t) for t in trees)
    assert all(bool(jnp.array_equal(x_, y_)) for x_, y_ in zip(a, b))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

"""Legacy lidar VQ stack (mobi_tpu/models/lidar_vq.py vs reference
ldm/models/lidar_diffusion.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.lidar_vq import (
    CircularConv,
    VectorQuantizer,
    VQDecoder,
    VQEncoder,
    VQModel,
    VQModelInterface,
    circular_pad,
)

DD = dict(
    ch=32,
    ch_mult=(1, 2),
    strides=((1, 2),),
    num_res_blocks=1,
    attn_levels=(),
    in_channels=1,
    z_channels=8,
)


def test_circular_pad_wraps_width():
    x = jnp.arange(8.0).reshape(1, 1, 8, 1)
    p = circular_pad(x, (2, 2, 0, 0))
    assert p.shape == (1, 1, 12, 1)
    np.testing.assert_allclose(p[0, 0, :2, 0], [6.0, 7.0])
    np.testing.assert_allclose(p[0, 0, -2:, 0], [0.0, 1.0])


def test_circular_conv_azimuth_equivariance():
    """Rolling the input along width rolls the output (stride 1)."""
    conv = CircularConv(4, (3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 2))
    params = conv.init(jax.random.PRNGKey(1), x)
    y = conv.apply(params, x)
    y_roll = conv.apply(params, jnp.roll(x, 5, axis=2))
    np.testing.assert_allclose(jnp.roll(y, 5, axis=2), y_roll, atol=1e-5)


def test_vq_encoder_decoder_shapes():
    enc = VQEncoder(**DD)
    dec = VQDecoder(**{k: v for k, v in DD.items() if k != "in_channels"},
                    out_ch=1)
    x = jnp.zeros((2, 8, 32, 1))
    ep = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(ep, x)
    # one (1,2) stride level: height unchanged, width halved
    assert z.shape == (2, 8, 16, 8)
    dp = dec.init(jax.random.PRNGKey(1), z)
    rec = dec.apply(dp, z)
    assert rec.shape == x.shape


def test_vector_quantizer_output_in_codebook_and_straight_through():
    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    quant, loss, idx = vq.apply(params, z)
    codebook = params["params"]["embedding"]
    np.testing.assert_allclose(
        quant, codebook[idx], atol=1e-6
    )
    assert idx.shape == (2, 3, 5)
    assert float(loss) >= 0.0

    # straight-through: d quant / d z == identity
    def f(z):
        q, _, _ = vq.apply(params, z)
        return jnp.sum(q * 2.0)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(g, jnp.full_like(z, 2.0), atol=1e-6)


def test_vector_quantizer_picks_nearest_code():
    vq = VectorQuantizer(n_embed=8, embed_dim=2)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 2)))
    codebook = np.asarray(params["params"]["embedding"])
    z = jnp.asarray(codebook[3] + 1e-4)[None, None, None, :]
    _, _, idx = vq.apply(params, z)
    assert int(idx[0, 0, 0]) == int(
        np.argmin(((codebook - np.asarray(z)[0, 0, 0]) ** 2).sum(-1))
    )


def test_vqmodel_roundtrip_and_interface():
    model = VQModel(ddconfig=DD, n_embed=32, embed_dim=4)
    x = jnp.zeros((1, 8, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    rec, emb_loss = model.apply(params, x)
    assert rec.shape == x.shape and np.isfinite(float(emb_loss))

    iface = VQModelInterface(ddconfig=DD, n_embed=32, embed_dim=4)
    # interface encode consumes only the depth channel of a 2ch range image
    x2 = jnp.zeros((1, 8, 32, 2))
    ip = iface.init(jax.random.PRNGKey(0), x2)
    h = iface.apply(ip, x2, method=VQModelInterface.encode)
    assert h.shape == (1, 8, 16, 4)  # PRE-quantization latent, embed_dim ch
    rec = iface.apply(ip, h, method=VQModelInterface.decode)
    assert rec.shape == (1, 8, 32, 1)
    rec_nq = iface.apply(
        ip, h, True, method=VQModelInterface.decode
    )
    assert rec_nq.shape == rec.shape


def test_vqmodel_use_mask_clamps_to_invalid():
    model = VQModel(ddconfig=DD, n_embed=16, embed_dim=4, use_mask=True)
    x = jnp.zeros((1, 8, 32, 1))
    params = model.init(jax.random.PRNGKey(2), x)
    rec, _ = model.apply(params, x)
    assert rec.shape == x.shape
    # masked pixels are exactly -1 (lidar_diffusion.py:996-999)
    assert np.all((np.asarray(rec) == -1.0) | np.isfinite(np.asarray(rec)))

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mobi_tpu.models.clip import CLIPVisionTower, clip_normalize, quick_gelu
from mobi_tpu.models.encoders import (
    BBoxEmbedder,
    XFTransformer,
    fourier_embed,
    fourier_out_dim,
)


def test_fourier_embed_matches_reference_layout():
    """[x, sin(f x), cos(f x) for f in 1,2,4,8] (modules.py:227-252)."""
    x = np.array([[0.5, -0.25, 1.0]], dtype=np.float32)
    out = np.asarray(fourier_embed(jnp.asarray(x), num_freqs=4))
    assert out.shape == (1, 27)
    assert fourier_out_dim(3, 4) == 27
    np.testing.assert_allclose(out[0, :3], x[0], atol=1e-7)
    expect = []
    for f in [1.0, 2.0, 4.0, 8.0]:
        expect.append(np.sin(x[0] * f))
        expect.append(np.cos(x[0] * f))
    np.testing.assert_allclose(out[0, 3:], np.concatenate(expect), atol=1e-6)


def test_bbox_embedder_shape_and_dim():
    be = BBoxEmbedder()
    bbox = jnp.zeros((3, 8, 3))
    params = be.init(jax.random.PRNGKey(0), bbox)
    # bbox_proj maps 8*27=216 -> 768 (modules.py:194-195)
    k = params["params"]["bbox_proj"]["Dense_0"]["kernel"]
    assert k.shape == (216, 768)
    out = be.apply(params, bbox)
    assert out.shape == (3, 1, 768)


def test_quick_gelu_matches_hf():
    x = torch.linspace(-4, 4, 81)
    ref = (x * torch.sigmoid(1.702 * x)).numpy()
    ours = np.asarray(quick_gelu(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_clip_normalize():
    img = jnp.zeros((1, 4, 4, 3))  # [-1,1] range -> 0.5 in [0,1]
    out = np.asarray(clip_normalize(img))
    from mobi_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    expect = (0.5 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-6)


def test_clip_tower_shapes_tiny():
    tower = CLIPVisionTower(image_size=32, patch_size=16, width=64, layers=2, heads=4)
    x = jnp.zeros((2, 32, 32, 3))
    params = tower.init(jax.random.PRNGKey(0), x)
    pooled = tower.apply(params, x)
    assert pooled.shape == (2, 64)
    # position table: 4 patches + CLS
    assert params["params"]["position_embedding"].shape == (5, 64)


def test_xf_single_token_attention_is_projection():
    """With n_ctx=1, softmax over one key is 1, so attn(x) ==
    c_proj(v(x)) — validates the fused-QKV split layout (xf.py:60-78)."""
    xf = XFTransformer(layers=1, heads=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16))
    params = xf.init(jax.random.PRNGKey(1), x)
    out = xf.apply(params, x)
    p = params["params"]["resblock_0"]

    def dense(p, v):
        return v @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"])

    xn = np.asarray(x)
    ln1 = p["ln_1"]
    mu = xn.mean(-1, keepdims=True)
    var = xn.var(-1, keepdims=True)
    h = (xn - mu) / np.sqrt(var + 1e-5) * np.asarray(ln1["scale"]) + np.asarray(ln1["bias"])
    qkv = dense(p["c_qkv"], h)
    v = qkv[..., 2 * 16 :]
    attn_out = dense(p["c_proj"], v)
    x1 = xn + attn_out
    ln2 = p["ln_2"]
    mu2 = x1.mean(-1, keepdims=True)
    var2 = x1.var(-1, keepdims=True)
    h2 = (x1 - mu2) / np.sqrt(var2 + 1e-5) * np.asarray(ln2["scale"]) + np.asarray(ln2["bias"])
    import scipy.stats  # noqa: F401  (erf gelu via torch below)

    g = torch.nn.functional.gelu(torch.from_numpy(dense(p["c_fc"], h2))).numpy()
    expect = x1 + dense(p["mlp_c_proj"], g)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)

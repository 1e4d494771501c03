"""Micro-parity of our NHWC primitives against torch reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mobi_tpu.models.layers import (
    Conv2d,
    Downsample,
    GroupNorm,
    LayerNorm,
    Upsample,
    upsample_nearest_2x,
    swish,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    gn = GroupNorm(num_groups=32, eps=1e-6)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = gn.apply(params, jnp.asarray(x))
    ref = F.group_norm(
        _nchw(x), 32, torch.ones(64), torch.zeros(64), eps=1e-6
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_layernorm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    ln = LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = ln.apply(params, jnp.asarray(x))
    ref = F.layer_norm(torch.from_numpy(x), (32,)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_conv_same_matches_torch_pad1():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 4)).astype(np.float32) * 0.1  # HWIO
    b = rng.normal(size=(4,)).astype(np.float32)
    conv = Conv2d(4, (3, 3))
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}}
    ours = conv.apply(params, jnp.asarray(x))
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    ref = F.conv2d(_nchw(x), wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )


def test_vae_downsample_matches_torch_asymmetric_pad():
    # reference pads (left,right,top,bottom)=(0,1,0,1) then conv stride 2
    # (model.py:73-76)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    down = Downsample(with_conv=True)
    params = down.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["conv"]["Conv_0"]["kernel"])
    b = np.asarray(params["params"]["conv"]["Conv_0"]["bias"])
    ours = down.apply(params, jnp.asarray(x))
    xt = F.pad(_nchw(x), (0, 1, 0, 1))
    ref = F.conv2d(xt, torch.from_numpy(w).permute(3, 2, 0, 1), torch.from_numpy(b), stride=2)
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )
    assert ours.shape == (1, 4, 4, 2)


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    ours = upsample_nearest_2x(jnp.asarray(x))
    ref = F.interpolate(_nchw(x), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=0
    )


def test_swish_matches_torch_silu():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(swish(jnp.asarray(x))), F.silu(torch.from_numpy(x)).numpy(),
        atol=1e-6,
    )


def test_attention_matches_torch_sdpa():
    from mobi_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(5)
    B, N, H, D = 2, 16, 4, 8
    q = rng.normal(size=(B, N, H * D)).astype(np.float32)
    k = rng.normal(size=(B, N, H * D)).astype(np.float32)
    v = rng.normal(size=(B, N, H * D)).astype(np.float32)
    ours = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=H, backend="xla"
    )
    tq = torch.from_numpy(q).view(B, N, H, D).transpose(1, 2)
    tk = torch.from_numpy(k).view(B, N, H, D).transpose(1, 2)
    tv = torch.from_numpy(v).view(B, N, H, D).transpose(1, 2)
    ref = F.scaled_dot_product_attention(tq, tk, tv)
    ref = ref.transpose(1, 2).reshape(B, N, H * D).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

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


def test_fused_groupnorm_silu_matches_reference():
    """Pallas fused GN+SiLU (interpret mode) == GroupNorm + swish, and the
    custom VJP matches the reference gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mobi_tpu.models.layers import GroupNorm, swish
    from mobi_tpu.ops.fused_norm import _gn_silu_reference, fused_groupnorm_silu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(64).astype(np.float32))

    gn = GroupNorm(num_groups=32, eps=1e-5)
    want = swish(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    got = fused_groupnorm_silu(x, scale, bias, 32, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # bf16 activations round-trip through the kernel dtype
    got16 = fused_groupnorm_silu(
        x.astype(jnp.bfloat16), scale, bias, 32, 1e-5, interpret=True
    )
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(want), atol=3e-2
    )

    # gradient parity (custom VJP recomputes via the reference path)
    def loss_fused(x, s, b):
        return fused_groupnorm_silu(x, s, b, 32, 1e-5, True).sum()

    def loss_ref(x, s, b):
        return _gn_silu_reference(x, s, b, 32, 1e-5).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_resblock_fused_gn_env_knob(monkeypatch):
    """MOBI_FUSED_GN=1 keeps the ResBlock param tree and (on CPU fallback)
    the numerics identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mobi_tpu.models.unet import ResBlock

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 8, 8, 64)).astype(np.float32))
    emb = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 32)).astype(np.float32))
    blk = ResBlock()
    params = blk.init(jax.random.PRNGKey(0), x, emb)
    base = blk.apply(params, x, emb)
    monkeypatch.setenv("MOBI_FUSED_GN", "1")
    fused = blk.apply(params, x, emb)  # CPU -> reference fallback
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=1e-5)

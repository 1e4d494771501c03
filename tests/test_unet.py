import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.unet import UNetModel

# Tiny config with the same topology as MObI-512 (2 levels instead of 4).
TINY = dict(
    in_channels=9,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(2, 1),
    channel_mult=(1, 2),
    num_heads=4,
    context_dim=64,
)


def _init(unet, b=2, hw=8, n_tokens=2):
    x = jnp.zeros((b, hw, hw, unet.in_channels))
    t = jnp.zeros((b,), dtype=jnp.int32)
    ctx = jnp.zeros((b, n_tokens, unet.context_dim))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    return params, x, t, ctx


@pytest.fixture(scope="module")
def mm_unet():
    unet = UNetModel(bbox_cond=True, use_camera=True, use_lidar=True, **TINY)
    params, *_ = _init(unet)
    return unet, params


def test_output_shape(mm_unet):
    unet, params = mm_unet
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 8, 8, 9))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64))
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_zero_init_output_is_zero(mm_unet):
    """Final conv is zero-initialized (openaimodel.py:833-837)."""
    unet, params = mm_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 9))
    t = jnp.array([0, 999])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 64))
    out = unet.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)


def _middle_features(unet, params, x, t, ctx):
    """Probe an internal activation that is NOT behind the zero-init out conv:
    capture the input to the final GroupNorm via intermediates."""
    _, state = unet.apply(
        params, x, t, ctx, capture_intermediates=lambda mdl, name: True
    )
    inter = state["intermediates"]
    return np.asarray(inter["middle_block_1"]["__call__"][0])


def test_cross_modal_is_identity_at_init(mm_unet):
    """Zero-init cross-modal connectors: perturbing lidar rows must not
    change camera activations at init (attention.py:218-223,245-263)."""
    unet, params = mm_unet
    t = jnp.array([5, 5, 7, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(6), (4, 2, 64))
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 9))
    # batch is [cam0, lid0, cam1, lid1]; perturb lidar entries only
    x2 = x.at[1::2].add(jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 9)))
    f1 = _middle_features(unet, params, x, t, ctx)
    f2 = _middle_features(unet, params, x2, t, ctx)
    np.testing.assert_allclose(f1[0::2], f2[0::2], atol=1e-5)
    assert not np.allclose(f1[1::2], f2[1::2])


from tests.helpers import perturb_params as _perturb_params  # noqa: E402


def test_bbox_adapter_is_identity_when_connector_zero(mm_unet):
    """The bbox token (context[:,1]) reaches the residual stream ONLY through
    the zero-init cond_adapter_connector (attention.py:236-243): with every
    other param perturbed off init but the connector held at zero, perturbing
    the bbox token must be a no-op while the CLIP token must not be."""
    unet, params = mm_unet
    params = {"params": _perturb_params(
        params["params"], keep_zero=("cond_adapter_connector",)
    )}
    t = jnp.array([5, 5])
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 9))
    ctx = jax.random.normal(jax.random.PRNGKey(10), (2, 2, 64))
    ctx_bbox_perturbed = ctx.at[:, 1].add(1.0)
    ctx_clip_perturbed = ctx.at[:, 0].add(1.0)
    f = _middle_features(unet, params, x, t, ctx)
    f_bbox = _middle_features(unet, params, x, t, ctx_bbox_perturbed)
    f_clip = _middle_features(unet, params, x, t, ctx_clip_perturbed)
    np.testing.assert_allclose(f, f_bbox, atol=1e-5)
    assert not np.allclose(f, f_clip)


def test_timestep_changes_output(mm_unet):
    unet, params = mm_unet
    params = {"params": _perturb_params(params["params"])}
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 9))
    ctx = jax.random.normal(jax.random.PRNGKey(12), (2, 2, 64))
    f1 = _middle_features(unet, params, x, jnp.array([1, 1]), ctx)
    f2 = _middle_features(unet, params, x, jnp.array([900, 900]), ctx)
    assert not np.allclose(f1, f2)


def test_adapter_param_partition():
    """The trainable partition is exactly the reference's name rule:
    cond_adapter | lidar | cross_modal (ddpm.py:1686-1698)."""
    from mobi_tpu.models.diffusion import adapter_trainable_mask

    unet = UNetModel(bbox_cond=True, use_camera=True, use_lidar=True, **TINY)
    params, *_ = _init(unet)
    mask = adapter_trainable_mask(params["params"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    trainable = [jax.tree_util.keystr(p) for p, v in leaves if v]
    frozen = [jax.tree_util.keystr(p) for p, v in leaves if not v]
    assert any("cond_adapter_attn" in n for n in trainable)
    assert any("cross_modal_attn_camera" in n for n in trainable)
    assert any("cross_modal_connector_lidar" in n for n in trainable)
    assert all(
        "cond_adapter" in n or "lidar" in n or "cross_modal" in n
        for n in trainable
    )
    assert any("attn1" in n for n in frozen)
    assert any("time_embed" in n for n in frozen)


def test_use_checkpoint_remat_same_values_and_grads(mm_unet):
    """use_checkpoint wires nn.remat: outputs and gradients must be identical
    to the non-rematted UNet (reference CheckpointFunction contract,
    diffusionmodules/util.py:102-149)."""
    unet, params = mm_unet
    params = {"params": _perturb_params(params["params"])}
    unet_r = UNetModel(
        bbox_cond=True, use_camera=True, use_lidar=True, use_checkpoint=True,
        **TINY,
    )
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 8, 8, 9))
    t = jnp.array([7, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(21), (2, 2, 64))

    out_a = unet.apply(params, x, t, ctx)
    out_b = unet_r.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def loss(mod):
        return lambda p: (mod.apply(p, x, t, ctx) ** 2).sum()

    g_a = jax.grad(loss(unet))(params)
    g_b = jax.grad(loss(unet_r))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_a),
        jax.tree_util.tree_leaves_with_path(g_b),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_camera_only_unet():
    unet = UNetModel(bbox_cond=False, use_camera=True, use_lidar=False, **TINY)
    x = jnp.zeros((2, 8, 8, 9))
    t = jnp.zeros((2,), dtype=jnp.int32)
    ctx = jnp.zeros((2, 1, 64))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    names = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
    }
    assert not any("cross_modal" in n for n in names)
    assert not any("cond_adapter" in n for n in names)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)


def test_remat_scope_transformer_only():
    """use_checkpoint='transformer' (store ResBlocks, remat transformers)
    produces the same forward/gradient as remat-everything."""
    import jax

    outs = {}
    for mode in (True, "transformer"):
        unet = UNetModel(use_checkpoint=mode, **TINY)
        x = jnp.ones((2, 8, 8, 9))
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.ones((2, 2, TINY["context_dim"]))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx)

        def loss(p):
            return jnp.mean(unet.apply(p, x, t, ctx) ** 2)

        val, grad = jax.value_and_grad(loss)(params)
        outs[str(mode)] = (float(val), grad)
    assert np.isclose(outs["True"][0], outs["transformer"][0], rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        outs["True"][1], outs["transformer"][1],
    )

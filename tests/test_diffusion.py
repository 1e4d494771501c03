"""End-to-end tests of the MobiDiffusion model on a tiny config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu.models.diffusion import (
    MobiConfig,
    MobiDiffusion,
    deinterleave_modalities,
    interleave_modalities,
)

TINY = MobiConfig(
    timesteps=1000,
    latent_size=8,
    image_height=32,
    image_width=32,
    range_height=32,
    range_width=32,
    unet_channels=32,
    unet_channel_mult=(1, 2),
    unet_num_res_blocks=1,
    unet_attention_resolutions=(2, 1),
    unet_num_heads=4,
    context_dim=64,
    ref_image_size=32,
    vae_ch=16,
    vae_ch_mult=(1, 1, 2),   # f=4: 32 -> 8 latent == latent_size
    vae_num_res_blocks=1,
    clip_width=96,
)


from mobi_tpu.models.clip import CLIPVisionTower  # noqa: E402
from mobi_tpu.models.encoders import BBoxEmbedder, CondStageModel, XFTransformer  # noqa: E402
from mobi_tpu.models.layers import LayerNorm  # noqa: E402


class TinyCondStage(CondStageModel):
    """CondStageModel with a miniature CLIP tower (fast tests)."""

    def setup(self):
        self.transformer = CLIPVisionTower(
            image_size=32, patch_size=16, width=96, layers=2, heads=4
        )
        self.mapper = XFTransformer(layers=2, heads=1)
        self.final_ln = LayerNorm()
        self.bbox_embedder = BBoxEmbedder(proj_dims=(64, 48, 48, 64))


def tiny_model_and_params():
    model = MobiDiffusion(TINY)
    model.cond_model = TinyCondStage(conditions=("ref_image", "ref_bbox"))
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def make_batch(b=1, rng=None):
    rng = rng or np.random.default_rng(0)
    f32 = np.float32
    return {
        "image": {
            "GT": jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)).astype(f32)),
            "inpaint_image": jnp.asarray(
                rng.uniform(-1, 1, (b, 32, 32, 3)).astype(f32)
            ),
            "inpaint_mask": jnp.asarray(
                (rng.uniform(0, 1, (b, 32, 32, 1)) > 0.3).astype(f32)
            ),
            "cond": {
                "ref_image": jnp.asarray(
                    rng.uniform(-1, 1, (b, 32, 32, 3)).astype(f32)
                ),
                "ref_bbox": jnp.asarray(rng.uniform(0, 1, (b, 8, 3)).astype(f32)),
            },
        },
        "lidar": {
            "range_data": jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 2)).astype(f32)),
            "range_data_inpaint": jnp.asarray(
                rng.uniform(-1, 1, (b, 32, 32, 2)).astype(f32)
            ),
            "range_mask": jnp.asarray(
                (rng.uniform(0, 1, (b, 32, 32, 1)) > 0.3).astype(f32)
            ),
            "cond": {
                "ref_bbox": jnp.asarray(rng.uniform(0, 1, (b, 8, 3)).astype(f32)),
            },
        },
    }


@pytest.fixture(scope="module")
def model_params():
    return tiny_model_and_params()


def test_interleave_roundtrip():
    a = jnp.arange(12).reshape(3, 4)
    b = -jnp.arange(12).reshape(3, 4)
    inter = interleave_modalities([a, b])
    # [a0, b0, a1, b1, ...] (reference cat_interleave, ldm/util.py:213-221)
    np.testing.assert_array_equal(np.asarray(inter[0]), np.asarray(a[0]))
    np.testing.assert_array_equal(np.asarray(inter[1]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(inter[2]), np.asarray(a[1]))
    a2, b2 = deinterleave_modalities(inter)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))


def test_get_input_shapes(model_params):
    model, params = model_params
    batch = make_batch(b=2)
    data = model.get_input(params, batch, jax.random.PRNGKey(0), encode_cond=True)
    # interleaved: 2 samples x 2 modalities, latent 8x8, 9 channels
    assert data["z"].shape == (4, 8, 8, 9)
    assert data["cond"].shape == (4, 2, 64)
    assert data["z_lidar_full"].shape == (2, 8, 8, 4)
    # mask channel is exactly the nearest-resized input mask
    assert set(np.unique(np.asarray(data["z"][..., 8]))) <= {0.0, 1.0}


def test_training_loss_finite_and_grads_flow(model_params):
    from tests.helpers import perturb_params

    model, params = model_params
    # off zero-init, else the zero out_conv blocks all upstream gradients
    params = perturb_params(params)
    batch = make_batch(b=2)

    def loss_fn(p):
        loss, _ = model.training_loss(p, batch, jax.random.PRNGKey(1))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # adapter params receive gradients
    g = grads["unet"]
    leaves = jax.tree_util.tree_leaves_with_path(g)
    from jax.tree_util import keystr

    adapter_norms = [
        float(jnp.abs(v).sum())
        for p, v in leaves
        if "cross_modal_attn" in keystr(p) and "to_k" in keystr(p)
    ]
    assert any(n > 0 for n in adapter_norms), "cross-modal adapters got no grads"
    # bbox embedder gets gradients (trainable cond stage)
    bb = jax.tree_util.tree_leaves(grads["cond"])
    assert any(float(jnp.abs(v).sum()) > 0 for v in bb)


def test_lidar_latent_alignment_noop_when_square(model_params):
    model, params = model_params
    z = jnp.arange(2 * 8 * 8 * 9, dtype=jnp.float32).reshape(2, 8, 8, 9)
    bbox = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 8, 3)), jnp.float32)
    z2, bbox2, geom = model.align_lidar_latent(z, bbox)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z))
    # x renorm with W == latent_size, left == 0 is identity
    np.testing.assert_allclose(np.asarray(bbox2[..., 0]), np.asarray(bbox[..., 0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bbox2[..., 1]), np.asarray(bbox[..., 1]), rtol=1e-6)


def test_lidar_latent_alignment_crop_pad():
    cfg = TINY
    model = MobiDiffusion(cfg)
    # wide, short lidar latent: [B, 4, 16, 9] -> crop W to 8, pad H to 8
    z = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 4, 16, 9)), jnp.float32
    )
    bbox = jnp.asarray([[[0.5, 0.5, 0.0]] * 8], jnp.float32)
    z2, bbox2, geom = model.align_lidar_latent(z, bbox)
    assert z2.shape == (1, 8, 8, 9)
    assert geom == {"W": 16, "H": 4, "left": 4, "pad": 2}
    # center crop: columns 4..12
    np.testing.assert_allclose(
        np.asarray(z2[:, 2:6, :, :]), np.asarray(z[:, :, 4:12, :])
    )
    # padding rows are zero
    np.testing.assert_allclose(np.asarray(z2[:, :2]), 0.0)
    # bbox renorm: x 0.5*16 -> (8-4)/8 = 0.5 ; y += 2/8
    np.testing.assert_allclose(np.asarray(bbox2[0, 0, 0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bbox2[0, 0, 1]), 0.75, rtol=1e-6)


def test_cfg_uncond_tokens(model_params):
    model, params = model_params
    toks = model.uncond_tokens(params, 4)
    assert toks.shape == (4, 2, 64)
    np.testing.assert_allclose(
        np.asarray(toks[0]), np.asarray(toks[3]), atol=0
    )


def test_sample_bf16_model_end_to_end():
    """bf16 activation config (the bench path): the sampler carry must stay
    float32 across the scan while the UNet/VAEs run bf16 — regression for the
    BENCH_r02 dtype-mismatch crash."""
    import dataclasses

    cfg = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    model = MobiDiffusion(cfg)
    model.cond_model = TinyCondStage(
        conditions=("ref_image", "ref_bbox"), dtype=jnp.bfloat16
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(b=1)
    data = model.get_input(params, batch, jax.random.PRNGKey(0), encode_cond=True)
    for sampler in ("ddim", "plms"):
        latents = model.sample(
            params, data, jax.random.PRNGKey(1), num_steps=3,
            guidance_scale=5.0, sampler=sampler,
        )
        assert latents.dtype == jnp.float32
        decoded = model.decode_sample(
            params, latents, data["z_lidar_full"], data["lidar_geom"]
        )
        assert np.all(np.isfinite(np.asarray(decoded["camera"], np.float32)))
        assert np.all(np.isfinite(np.asarray(decoded["lidar"], np.float32)))


def test_ddpm_sampler_integration(model_params):
    """sampler='ddpm' runs the full ancestral loop through the model surface
    (uses a short schedule via a tiny-timesteps config clone)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, timesteps=8)
    model = MobiDiffusion(cfg)
    model.cond_model = TinyCondStage(conditions=("ref_image", "ref_bbox"))
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(b=1)
    data = model.get_input(params, batch, jax.random.PRNGKey(0), encode_cond=True)
    latents = model.sample(
        params, data, jax.random.PRNGKey(1), guidance_scale=5.0, sampler="ddpm"
    )
    assert latents.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(latents)))


def test_sample_and_decode_shapes(model_params):
    model, params = model_params
    batch = make_batch(b=1)
    data = model.get_input(params, batch, jax.random.PRNGKey(0), encode_cond=True)
    latents = model.sample(
        params, data, jax.random.PRNGKey(1), num_steps=3, guidance_scale=5.0,
        sampler="plms",
    )
    assert latents.shape == (2, 8, 8, 4)
    decoded = model.decode_sample(
        params, latents, data["z_lidar_full"], data["lidar_geom"]
    )
    assert decoded["camera"].shape == (1, 32, 32, 3)
    assert decoded["lidar"].shape == (1, 32, 32, 2)
    assert np.all(np.isfinite(np.asarray(decoded["camera"])))


def test_camera_only_end_to_end():
    """configs/pbe.yaml structure: use_lidar=False, conditioning on the CLIP
    reference image only (no lidar stage, no bbox token, no interleave) —
    train step + sample + decode all run on the single-modality batch
    (reference pbe.yaml; ddpm.py camera-only branches)."""
    import dataclasses

    from tests.helpers import perturb_params

    from mobi_tpu.training import create_train_state, make_train_step

    cfg = dataclasses.replace(TINY, use_lidar=False, cond_stage_key=("ref_image",))
    model = MobiDiffusion(cfg)
    model.cond_model = TinyCondStage(conditions=("ref_image",))
    params = model.init_params(jax.random.PRNGKey(0))
    assert "vae_lidar" not in params

    batch = make_batch(b=2)
    del batch["lidar"]
    del batch["image"]["cond"]["ref_bbox"]

    # train step on the camera-only batch
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), base_lr=1e-3,
        params=perturb_params(params),
    )
    step_fn = make_train_step(model, tx)
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # inpaint pipeline: batch is NOT interleaved (one modality row per sample)
    data = model.get_input(params, batch, jax.random.PRNGKey(0), encode_cond=True)
    assert data["z"].shape == (2, 8, 8, 9)
    assert data["cond"].shape == (2, 1, 64)  # single CLIP token
    latents = model.sample(
        params, data, jax.random.PRNGKey(1), num_steps=3, guidance_scale=5.0,
        sampler="plms",
    )
    assert latents.shape == (2, 8, 8, 4)
    decoded = model.decode_sample(params, latents)
    assert decoded["camera"].shape == (2, 32, 32, 3)
    assert "lidar" not in decoded
    assert np.all(np.isfinite(np.asarray(decoded["camera"])))

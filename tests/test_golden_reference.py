"""Golden parity tests against the PyTorch reference at /root/reference.

Strategy: instantiate the actual reference torch modules at tiny scale,
randomize ALL their parameters (so zero-init adapters carry real signal),
export the state dict through mobi_tpu.import_torch, and require the flax
forward pass to match the torch forward pass to fp32 tolerance. This is the
load-bearing evidence that importing the published checkpoints
(Paint-by-Example model.ckpt / mobi_nuscenes_epoch28.ckpt /
range_autoencoder.ckpt) preserves the model function.

Covered reference surfaces:
  * UNetModel forward (openaimodel.py:528-898) incl. bbox-adapter and
    cross-modal attention (attention.py:197-313)
  * VAE Encoder/Decoder + quant convs (model.py:368-630; autoencoder.py:29-72),
    camera and lidar_adapter variants
  * CLIP vision tower + xf mapper + final LN (modules.py:142-170, xf.py:82-130)
    vs HuggingFace CLIPVisionModel
  * BBoxEmbedder (modules.py:182-215)
  * DDIM & PLMS full sampling loops w/ CFG (ddim.py:114-213, plms.py:115-239)
  * object-adaptive depth normalization (data/utils.py:537-580)
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference"
if not os.path.isdir(os.path.join(REF_PATH, "ldm")):
    pytest.skip("reference tree not mounted", allow_module_level=True)
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mobi_tpu.import_torch import (  # noqa: E402
    import_cond_stage,
    import_unet,
    import_vae,
    merge_imported,
    to_numpy_state_dict,
)

torch.manual_seed(0)


def _install_omegaconf_stub():
    """openaimodel.py:595 imports omegaconf only for an isinstance check on
    context_dim; the package is not installed here."""
    if "omegaconf" in sys.modules:
        return
    oc = types.ModuleType("omegaconf")
    listconfig = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    listconfig.ListConfig = ListConfig
    oc.listconfig = listconfig
    sys.modules["omegaconf"] = oc
    sys.modules["omegaconf.listconfig"] = listconfig


_install_omegaconf_stub()


def randomize_(module, seed=0, scale=0.05):
    """Overwrite every parameter with gaussian noise — kills zero-inits and
    ones-init norms so parity covers every weight."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def nchw_to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def nhwc(x_torch):
    return jnp.asarray(nchw_to_nhwc(x_torch.detach().numpy()))


def max_err(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


# ------------------------------------------------------------------- UNet
def test_unet_forward_parity():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    from mobi_tpu.models.unet import UNetModel

    ref = RefUNet(
        image_size=8, in_channels=9, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(2, 1), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=64, bbox_cond=True, use_camera=True, use_lidar=True,
    )
    randomize_(ref, seed=1)
    ref.eval()

    g = torch.Generator().manual_seed(2)
    x = torch.randn(4, 9, 8, 8, generator=g)
    t = torch.tensor([3, 3, 777, 777])
    ctx = torch.randn(4, 2, 64, generator=g)
    with torch.no_grad():
        out_ref = ref(x, timesteps=t, context=ctx)

    unet = UNetModel(
        in_channels=9, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        context_dim=64, bbox_cond=True, use_camera=True, use_lidar=True,
    )
    imported = import_unet(
        to_numpy_state_dict(ref.state_dict()),
        channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(2, 1),
    )
    init = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 8, 8, 9)),
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2, 64)),
    )["params"]
    params = merge_imported(init, imported)
    out = unet.apply(
        {"params": params}, nhwc(x), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()),
    )
    err = max_err(out, nchw_to_nhwc(out_ref.numpy()))
    assert err < 1e-4, f"UNet forward max-abs-err {err}"


# ------------------------------------------------------------------- VAE
@pytest.mark.parametrize("lidar_adapter", [False, True])
def test_vae_encode_decode_parity(lidar_adapter):
    from ldm.modules.diffusionmodules.model import Decoder as RefDec
    from ldm.modules.diffusionmodules.model import Encoder as RefEnc

    from mobi_tpu.models.vae import AutoencoderKL

    io_ch = 2 if lidar_adapter else 3
    # torch GroupNorm(32) needs channels divisible by 32 -> base ch 32
    common = dict(
        ch=32, out_ch=io_ch, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=[], in_channels=io_ch, resolution=32, z_channels=4,
        lidar_adapter=lidar_adapter,
    )
    enc = RefEnc(double_z=True, **common)
    dec = RefDec(**common)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    for i, m in enumerate((enc, dec, quant, post_quant)):
        randomize_(m, seed=10 + i)
        m.eval()

    g = torch.Generator().manual_seed(3)
    x = torch.randn(2, io_ch, 32, 32, generator=g)
    z = torch.randn(2, 4, 8, 8, generator=g)
    with torch.no_grad():
        moments = quant(enc(x))
        mean_ref = moments[:, :4]
        dec_ref = dec(post_quant(z))

    sd = {}
    for prefix, m in (("encoder.", enc), ("decoder.", dec),
                      ("quant_conv.", quant), ("post_quant_conv.", post_quant)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v
    imported = import_vae(
        to_numpy_state_dict(sd), ch_mult=(1, 2), num_res_blocks=1,
        resolution=32, lidar_adapter=lidar_adapter,
    )

    vae = AutoencoderKL(
        embed_dim=4, ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
        z_channels=4, out_ch=io_ch, lidar_adapter=lidar_adapter,
    )
    init = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, io_ch)), jax.random.PRNGKey(1)
    )["params"]
    params = merge_imported(init, imported)

    posterior = vae.apply({"params": params}, nhwc(x), method=vae.encode)
    err_enc = max_err(posterior.mean, nchw_to_nhwc(mean_ref.numpy()))
    assert err_enc < 1e-4, f"VAE encode mean max-abs-err {err_enc}"

    dec_out = vae.apply({"params": params}, nhwc(z), method=vae.decode)
    err_dec = max_err(dec_out, nchw_to_nhwc(dec_ref.numpy()))
    assert err_dec < 1e-4, f"VAE decode max-abs-err {err_dec}"


# ----------------------------------------------------- cond stage (CLIP et al)
def test_cond_stage_parity_vs_hf_clip_and_xf():
    """Full conditioning chain: HF CLIPVisionModel pooler -> xf mapper ->
    final LN (reference modules.py:164-170) vs CondStageModel.embed_image,
    plus BBoxEmbedder token parity."""
    transformers = pytest.importorskip("transformers")
    from ldm.modules.encoders.modules import BBoxEmbedder as RefBBox
    from ldm.modules.encoders.xf import Transformer as RefXF

    from mobi_tpu.models.clip import CLIPVisionTower
    from mobi_tpu.models.encoders import (
        BBoxEmbedder,
        CondStageModel,
        XFTransformer,
    )
    from mobi_tpu.models.layers import LayerNorm

    cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        hidden_act="quick_gelu",
    )
    clip = transformers.CLIPVisionModel(cfg)
    mapper = RefXF(1, 64, 2, 1)
    final_ln = torch.nn.LayerNorm(64)
    bbox = RefBBox()  # default proj_dims [768, 512, 512, 768]
    for i, m in enumerate((clip, mapper, final_ln, bbox)):
        randomize_(m, seed=20 + i)
        m.eval()

    g = torch.Generator().manual_seed(4)
    img = torch.randn(2, 3, 32, 32, generator=g)
    box = torch.rand(2, 8, 3, generator=g)
    with torch.no_grad():
        z = clip(pixel_values=img).pooler_output.unsqueeze(1)
        tok_ref = final_ln(mapper(z))
        bbox_ref = bbox(box)

    sd = {}
    for k, v in clip.state_dict().items():
        sd[f"transformer.{k}"] = v
    for k, v in mapper.state_dict().items():
        sd[f"mapper.{k}"] = v
    sd["final_ln.weight"] = final_ln.weight
    sd["final_ln.bias"] = final_ln.bias
    for k, v in bbox.state_dict().items():
        sd[f"bbox_embedder.{k}"] = v
    imported = import_cond_stage(to_numpy_state_dict(sd), num_clip_layers=2)

    class TinyCond(CondStageModel):
        def setup(self):
            self.transformer = CLIPVisionTower(
                image_size=32, patch_size=16, width=64, layers=2, heads=4
            )
            self.mapper = XFTransformer(layers=2, heads=1)
            self.final_ln = LayerNorm()
            self.bbox_embedder = BBoxEmbedder()

    model = TinyCond(conditions=("ref_image", "ref_bbox"))
    cond_in = {"ref_image": nhwc(img), "ref_bbox": jnp.asarray(box.numpy())}
    init = model.init(jax.random.PRNGKey(0), cond_in)["params"]
    params = merge_imported(init, imported)
    out = model.apply({"params": params}, cond_in)

    err_img = max_err(out["ref_image_token"], tok_ref.numpy())
    assert err_img < 1e-4, f"CLIP+mapper token max-abs-err {err_img}"
    err_bbox = max_err(out["ref_bbox_token"], bbox_ref.numpy())
    assert err_bbox < 1e-4, f"bbox token max-abs-err {err_bbox}"


# -------------------------------------------------------------- samplers
class _StubTorchModel:
    """Carries the schedule buffers DDIMSampler/PLMSSampler read
    (ddim.py:25-56) plus a deterministic apply_model shared with jax."""

    parameterization = "eps"

    def __init__(self, schedule):
        self.num_timesteps = schedule.num_timesteps
        self.device = torch.device("cpu")
        self.betas = torch.tensor(np.asarray(schedule.betas), dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(
            np.asarray(schedule.alphas_cumprod), dtype=torch.float32
        )
        self.alphas_cumprod_prev = torch.tensor(
            np.asarray(schedule.alphas_cumprod_prev), dtype=torch.float32
        )

    def apply_model(self, x, t, c):
        # mirror of _jax_stub_model below
        return (
            0.3 * x[:, :4]
            + 0.05 * x[:, 4:9].sum(dim=1, keepdim=True)
            + 0.02 * c.sum(dim=(1, 2)).view(-1, 1, 1, 1)
            + 0.001 * t.float().view(-1, 1, 1, 1)
        )


def _jax_stub_model(x9, t, ctx):
    # NHWC mirror of _StubTorchModel.apply_model
    return (
        0.3 * x9[..., :4]
        + 0.05 * x9[..., 4:9].sum(axis=-1, keepdims=True)
        + 0.02 * ctx.sum(axis=(1, 2))[:, None, None, None]
        + 0.001 * t.astype(jnp.float32)[:, None, None, None]
    )


def _cpu_sampler(cls, stub):
    class CPUSampler(cls):
        def register_buffer(self, name, attr):
            if isinstance(attr, torch.Tensor):
                attr = attr.to(torch.float32)
            setattr(self, name, attr)

    return CPUSampler(stub)


@pytest.mark.parametrize("scale", [1.0, 5.0])
def test_ddim_loop_parity(scale):
    from ldm.models.diffusion.ddim import DDIMSampler

    from mobi_tpu.models.samplers import ddim_sample
    from mobi_tpu.ops.schedules import DiffusionSchedule, SamplerTables

    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    stub = _StubTorchModel(sched)
    sampler = _cpu_sampler(DDIMSampler, stub)
    sampler.make_schedule(5, verbose=False)

    g = torch.Generator().manual_seed(5)
    x_T = torch.randn(2, 4, 8, 8, generator=g)
    rest = torch.randn(2, 5, 8, 8, generator=g)
    cond = torch.randn(2, 2, 16, generator=g)
    uc = torch.randn(2, 2, 16, generator=g)
    out_ref, _ = sampler.ddim_sampling(
        cond, (2, 4, 8, 8), x_T=x_T,
        unconditional_guidance_scale=scale,
        unconditional_conditioning=uc if scale != 1.0 else None,
        rest=rest,
    )

    tables = SamplerTables.create(sched, 5)
    out = ddim_sample(
        _jax_stub_model, tables, jax.random.PRNGKey(0), nhwc(x_T),
        jnp.asarray(cond.numpy()), nhwc(rest),
        uncond=jnp.asarray(uc.numpy()) if scale != 1.0 else None,
        guidance_scale=scale,
    )
    err = max_err(out, nchw_to_nhwc(out_ref.numpy()))
    assert err < 1e-4, f"DDIM loop (scale {scale}) max-abs-err {err}"


def test_plms_loop_parity():
    from ldm.models.diffusion.plms import PLMSSampler

    from mobi_tpu.models.samplers import plms_sample
    from mobi_tpu.ops.schedules import DiffusionSchedule, SamplerTables

    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    stub = _StubTorchModel(sched)
    sampler = _cpu_sampler(PLMSSampler, stub)
    sampler.make_schedule(10, verbose=False)

    g = torch.Generator().manual_seed(6)
    x_T = torch.randn(2, 4, 8, 8, generator=g)
    inpaint = torch.randn(2, 4, 8, 8, generator=g)
    mask = torch.ones(2, 1, 8, 8)
    cond = torch.randn(2, 2, 16, generator=g)
    uc = torch.randn(2, 2, 16, generator=g)
    out_ref, _ = sampler.plms_sampling(
        cond, (2, 4, 8, 8), x_T=x_T,
        unconditional_guidance_scale=5.0,
        unconditional_conditioning=uc,
        inpaint_image=inpaint, inpaint_mask=mask,
    )

    tables = SamplerTables.create(sched, 10)
    rest = jnp.concatenate([nhwc(inpaint), nhwc(mask)], axis=-1)
    out = plms_sample(
        _jax_stub_model, tables, nhwc(x_T), jnp.asarray(cond.numpy()), rest,
        uncond=jnp.asarray(uc.numpy()), guidance_scale=5.0,
    )
    err = max_err(out, nchw_to_nhwc(out_ref.numpy()))
    assert err < 1e-4, f"PLMS loop max-abs-err {err}"


def test_ddim_stochastic_encode_decode_parity():
    """stochastic_encode (ddim.py:215-229) + decode (ddim.py:231-250)."""
    from ldm.models.diffusion.ddim import DDIMSampler

    from mobi_tpu.models.samplers import ddim_decode, ddim_stochastic_encode
    from mobi_tpu.ops.schedules import DiffusionSchedule, SamplerTables

    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    stub = _StubTorchModel(sched)
    sampler = _cpu_sampler(DDIMSampler, stub)
    sampler.make_schedule(10, verbose=False)
    tables = SamplerTables.create(sched, 10)

    g = torch.Generator().manual_seed(8)
    x0 = torch.randn(2, 4, 8, 8, generator=g)
    noise = torch.randn(2, 4, 8, 8, generator=g)
    t_start = 6
    t_idx = torch.full((2,), t_start - 1, dtype=torch.long)

    enc_ref = sampler.stochastic_encode(x0, t_idx, noise=noise)
    enc = ddim_stochastic_encode(
        tables, nhwc(x0), jnp.full((2,), t_start - 1), nhwc(noise)
    )
    np.testing.assert_allclose(
        np.asarray(enc), nchw_to_nhwc(enc_ref.numpy()), atol=1e-5
    )

    rest = torch.randn(2, 5, 8, 8, generator=g)
    cond = torch.randn(2, 2, 16, generator=g)

    # NOTE: the reference's DDIMSampler.decode (ddim.py:231-250) forwards no
    # kwargs, so it cannot reach the MObI p_sample_ddim (which requires
    # 'rest'/'test_model_kwargs', ddim.py:169-176) — dead code as shipped.
    # Drive the REAL p_sample_ddim through decode's loop semantics instead.
    x_dec = enc_ref
    timesteps = sampler.ddim_timesteps[:t_start]
    for i, step_t in enumerate(np.flip(timesteps)):
        ts = torch.full((2,), int(step_t), dtype=torch.long)
        x_dec, _ = sampler.p_sample_ddim(
            x_dec, cond, ts, index=t_start - i - 1, rest=rest
        )
    dec = ddim_decode(
        _jax_stub_model, tables, jnp.asarray(np.asarray(enc)), t_start,
        jnp.asarray(cond.numpy()), nhwc(rest),
    )
    err = max_err(dec, nchw_to_nhwc(x_dec.numpy()))
    assert err < 1e-4, f"ddim decode max-abs-err {err}"


def test_ddim_tables_match_reference_make_schedule():
    from ldm.models.diffusion.ddim import DDIMSampler

    from mobi_tpu.ops.schedules import DiffusionSchedule, SamplerTables

    sched = DiffusionSchedule.create(1000, "linear", 0.00085, 0.0120)
    stub = _StubTorchModel(sched)
    sampler = _cpu_sampler(DDIMSampler, stub)
    sampler.make_schedule(50, verbose=False)

    tables = SamplerTables.create(sched, 50)
    # reference tables are in increasing-t order; ours in sampling order
    np.testing.assert_array_equal(
        np.asarray(tables.timesteps)[::-1], np.asarray(sampler.ddim_timesteps)
    )
    np.testing.assert_allclose(
        np.asarray(tables.alphas)[::-1], np.asarray(sampler.ddim_alphas),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tables.alphas_prev)[::-1],
        np.asarray(sampler.ddim_alphas_prev), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tables.sqrt_one_minus_alphas)[::-1],
        np.asarray(sampler.ddim_sqrt_one_minus_alphas), rtol=1e-6,
    )


# ----------------------------------------------------------------- rangenet
def test_rangenet_frd_feature_parity():
    """Full FRD feature extractor vs the reference RangeNet++ Model
    (eval_tool/lidar/rangenet/model.py) through return_final_logits=True,
    agg_type='depth' — backbone + decoder + 512-d depth aggregation."""
    import yaml

    sys.path.insert(0, os.path.join(REF_PATH, "eval_tool", "lidar"))
    from rangenet.model import Model as RefRangeNet  # noqa: E402

    from mobi_tpu.eval.rangenet import RangeNetFRD, import_rangenet_weights

    with open(os.path.join(REF_PATH, "eval_tool/lidar/rangenet/config.yaml")) as f:
        cfg = yaml.safe_load(f)
    ref = RefRangeNet(cfg)
    randomize_(ref, seed=30)
    # randomize BN running stats too (buffers, not parameters)
    g = torch.Generator().manual_seed(31)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    ref.eval()

    x = torch.randn(2, 5, 64, 128, generator=g)
    with torch.no_grad():
        feat_ref = ref(x, return_final_logits=True, agg_type="depth")

    params = import_rangenet_weights(
        to_numpy_state_dict(ref.backbone.state_dict()),
        to_numpy_state_dict(ref.decoder.state_dict()),
    )
    net = RangeNetFRD()
    feat = net.apply({"params": params}, nhwc(x))
    assert feat.shape == (2, 512)
    err = max_err(feat, feat_ref)
    assert err < 2e-4, f"rangenet FRD feature max-abs-err {err}"


def test_range_npy_to_input_matches_reference_dataset():
    """Input construction parity with frd_score.RangePathDataset:34-70."""
    import torch.nn.functional as F

    from mobi_tpu.eval.rangenet import range_npy_to_input

    rng = np.random.default_rng(0)
    H, W = 32, 256
    depth_n = rng.uniform(-1, 1, (H, W))
    inten = rng.uniform(-1, 1, (H, W))
    pitch = rng.uniform(-0.4, 0.2, (H, W))
    yaw = rng.uniform(-np.pi, np.pi, (H, W))
    npy = np.stack([depth_n, inten, pitch, yaw])

    # reference construction (frd_score.py:48-70)
    d = (depth_n + 1) / 2 * 54.0
    valid = (d > 1.4) & (d < 54.0)
    xyz = -np.ones((3, H, W))
    xyz[0] = np.cos(yaw) * np.cos(pitch) * d
    xyz[1] = -np.sin(yaw) * np.cos(pitch) * d
    xyz[2] = np.sin(pitch) * d
    ref = np.concatenate([d[None], inten[None], xyz], axis=0)
    ref[:, ~valid] = -1
    ref_t = torch.tensor(ref).float()
    ref_resized = F.interpolate(
        ref_t.unsqueeze(1), size=(64, 1024), mode="nearest"
    ).squeeze(1).numpy()

    ours = range_npy_to_input(npy)
    np.testing.assert_allclose(
        ours, ref_resized.transpose(1, 2, 0), atol=1e-5
    )


# ------------------------------------------------------- depth normalization
def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Resize:  # noqa: D401 - unused by the functions under test
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    transforms.Resize = Resize
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def test_depth_normalization_parity():
    _install_torchvision_stub()
    from ldm.data.utils import depth_normalization, inverse_depth_normalization

    from mobi_tpu.ops.ranges import (
        depth_normalization as ours_fwd,
        inverse_depth_normalization as ours_inv,
    )

    rng = np.random.default_rng(0)
    depth = rng.uniform(-1, 1, (4, 32, 64)).astype(np.float32)
    min_d, max_d = np.float32(-0.4), np.float32(0.3)

    ref = depth_normalization(
        torch.tensor(depth), torch.tensor(min_d), torch.tensor(max_d)
    ).numpy()
    ours = np.asarray(ours_fwd(jnp.asarray(depth), min_d, max_d))
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    ref_inv = inverse_depth_normalization(
        torch.tensor(ref), torch.tensor(min_d), torch.tensor(max_d)
    ).numpy()
    ours_inv_v = np.asarray(ours_inv(jnp.asarray(ours), min_d, max_d))
    np.testing.assert_allclose(ours_inv_v, ref_inv, atol=1e-6)

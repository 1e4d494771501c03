"""Whole-model LatentDiffusion golden parity.

Instantiates the REFERENCE `ldm.models.diffusion.ddpm.LatentDiffusion` at
tiny scale (pytorch_lightning / torchvision / taming / omegaconf stubbed),
randomizes every weight, exports through `import_mobi_checkpoint`, and pins
the glue the per-module golden tests don't cover:

  * get_input: 9-ch triplet assembly, lidar latent crop/pad + bbox renorm,
    camera/lidar interleave order (ddpm.py:757-834)
  * get_learned_conditioning: CLIP pooler -> xf mapper -> final LN ->
    proj_out + bbox token concat (ddpm.py:610-630)
  * p_losses with fixed (t, noise) (ddpm.py:1177-1217)
  * a full 5-step DDIM sample from fixed x_T (ddim.py:57-213)

VAE encodes use the posterior MODE on both sides (DiagonalGaussian.sample
is random and cannot be matched across frameworks).
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF_PATH = "/root/reference"
if REF_PATH not in sys.path:
    sys.path.insert(0, REF_PATH)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_golden_reference import (  # noqa: E402
    _install_omegaconf_stub,
    max_err,
    nhwc,
    randomize_,
)

from mobi_tpu.import_torch import import_mobi_checkpoint, merge_imported  # noqa: E402


def _install_ldm_runtime_stubs():
    """pytorch_lightning / torchvision / taming stubs sufficient to import
    and run ddpm.py + autoencoder.py + lidar_diffusion.py."""
    from torch import nn

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(nn.Module):
            @property
            def device(self):
                return torch.device("cpu")

            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

            def log_dict(self, *a, **k):
                pass

            @property
            def global_step(self):
                return 0

        pl.LightningModule = LightningModule
        utilities = types.ModuleType("pytorch_lightning.utilities")
        distributed = types.ModuleType(
            "pytorch_lightning.utilities.distributed"
        )
        distributed.rank_zero_only = lambda fn: fn
        utilities.distributed = distributed
        pl.utilities = utilities
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = utilities
        sys.modules["pytorch_lightning.utilities.distributed"] = distributed

    # NB: extend (don't skip) an existing stub — test_golden_reference.py
    # installs a torchvision stub WITHOUT the .utils submodule, and stub
    # modules aren't packages, so `from torchvision.utils import make_grid`
    # needs an explicit sys.modules entry regardless of who stubbed first.
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if "torchvision.utils" not in sys.modules:
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda x, **k: x
        tv.utils = tv_utils
        sys.modules["torchvision.utils"] = tv_utils
    if "torchvision.transforms" not in sys.modules:
        tv_tr = types.ModuleType("torchvision.transforms")

        class Resize:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tv_tr.Resize = Resize
        tv.transforms = tv_tr
        sys.modules["torchvision.transforms"] = tv_tr

    if "taming" not in sys.modules:
        taming = types.ModuleType("taming")
        tmod = types.ModuleType("taming.modules")
        tvq = types.ModuleType("taming.modules.vqvae")
        tq = types.ModuleType("taming.modules.vqvae.quantize")

        class VectorQuantizer2(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        tq.VectorQuantizer2 = VectorQuantizer2
        sys.modules["taming"] = taming
        sys.modules["taming.modules"] = tmod
        sys.modules["taming.modules.vqvae"] = tvq
        sys.modules["taming.modules.vqvae.quantize"] = tq

    _install_omegaconf_stub()
    om = sys.modules["omegaconf"]
    if not hasattr(om, "listconfig"):
        listconfig = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        listconfig.ListConfig = ListConfig
        om.listconfig = listconfig
        om.ListConfig = ListConfig
        sys.modules["omegaconf.listconfig"] = listconfig


CTX = 64


def _tiny_ld():
    """Reference LatentDiffusion at the dryrun-tiny scale."""
    _install_ldm_runtime_stubs()
    from omegaconf.listconfig import ListConfig

    from ldm.models.diffusion.ddpm import LatentDiffusion
    from ldm.modules.encoders import modules as ref_enc

    class TinyRefCondStage(ref_enc.FrozenCLIPImageEmbedder):
        """FrozenCLIPImageEmbedder with a config-built tiny CLIP tower (no
        from_pretrained download)."""

        def __init__(self, conditions):
            torch.nn.Module.__init__(self)
            cfg = transformers.CLIPVisionConfig(
                hidden_size=CTX, intermediate_size=4 * CTX,
                num_hidden_layers=2, num_attention_heads=4, image_size=32,
                patch_size=16, hidden_act="quick_gelu",
            )
            self.transformer = transformers.CLIPVisionModel(cfg)
            self.final_ln = ref_enc.LayerNorm(CTX)
            self.mapper = ref_enc.Transformer(1, CTX, 2, 1)
            self.bbox_embedder = ref_enc.BBoxEmbedder(
                proj_dims=[CTX, 48, 48, CTX]
            )
            self.freeze()

    # make the class reachable for instantiate_from_config
    me = sys.modules[__name__]
    me.TinyRefCondStage = TinyRefCondStage

    def vae_cfg(in_ch, out_ch, lidar_adapter=False):
        dd = dict(
            double_z=True, z_channels=4, resolution=32, in_channels=in_ch,
            out_ch=out_ch, ch=32, ch_mult=[1, 1, 2], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0,
        )
        if lidar_adapter:
            dd["lidar_adapter"] = True
        return {
            "target": "ldm.models.autoencoder.AutoencoderKL",
            "params": {
                "embed_dim": 4, "ddconfig": dd,
                "lossconfig": {"target": "torch.nn.Identity"},
            },
        }

    unet_cfg = {
        "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
        "params": dict(
            image_size=8, in_channels=9, out_channels=4, model_channels=32,
            attention_resolutions=[2, 1], num_res_blocks=1,
            channel_mult=[1, 2], num_heads=4, use_spatial_transformer=True,
            transformer_depth=1, context_dim=CTX, use_checkpoint=False,
            legacy=False, add_conv_in_front_of_unet=False, bbox_cond=True,
            use_camera=True, use_lidar=True,
        ),
    }
    ld = LatentDiffusion(
        cond_stage_config={
            "target": f"{__name__}.TinyRefCondStage",
            "params": {"conditions": ["ref_image", "ref_bbox"]},
        },
        first_stage_config=vae_cfg(3, 3),
        lidar_stage_config=vae_cfg(2, 2, lidar_adapter=True),
        cond_stage_key=ListConfig(["ref_image", "ref_bbox"]),
        cond_stage_trainable=True,
        conditioning_key="crossattn",
        scale_factor=0.18215,
        lidar_scale_factor=0.18215,
        use_camera=True,
        use_lidar=True,
        range_object_norm=True,
        range_object_norm_scale=0.75,
        range_int_norm=True,
        unet_config=unet_cfg,
        timesteps=1000,
        beta_schedule="linear",
        linear_start=0.00085,
        linear_end=0.0120,
        first_stage_key="inpaint",
        image_size=8,
        channels=4,
        monitor=None,
        use_ema=False,
        u_cond_percent=0.2,
    )
    # the reference hardcodes the big-model projection dims — shrink them
    ld.proj_out = torch.nn.Linear(CTX, CTX)
    ld.learnable_vector = torch.nn.Parameter(
        torch.randn(1, 1, CTX), requires_grad=False
    )
    ld.bbox_uncond_vector = torch.nn.Parameter(torch.randn(1, 1, CTX))
    randomize_(ld, seed=77)
    ld.eval()
    return ld


def _ours_from(ld):
    """MobiDiffusion tiny clone with the reference weights imported."""
    from mobi_tpu.models.clip import CLIPVisionTower
    from mobi_tpu.models.diffusion import MobiConfig, MobiDiffusion
    from mobi_tpu.models.encoders import (
        BBoxEmbedder,
        CondStageModel,
        XFTransformer,
    )
    from mobi_tpu.models.layers import LayerNorm

    cfg = MobiConfig(
        latent_size=8, image_height=32, image_width=32, range_height=32,
        range_width=32, unet_channels=32, unet_channel_mult=(1, 2),
        unet_num_res_blocks=1, unet_attention_resolutions=(2, 1),
        unet_num_heads=4, context_dim=CTX, ref_image_size=32, clip_width=CTX,
        vae_ch=32, vae_ch_mult=(1, 1, 2), vae_num_res_blocks=1,
    )
    model = MobiDiffusion(cfg)

    class TinyCond(CondStageModel):
        def setup(self):
            self.transformer = CLIPVisionTower(
                image_size=32, patch_size=16, width=CTX, layers=2, heads=4
            )
            self.mapper = XFTransformer(layers=2, heads=1)
            self.final_ln = LayerNorm()
            self.bbox_embedder = BBoxEmbedder(proj_dims=(CTX, 48, 48, CTX))

    model.cond_model = TinyCond(conditions=("ref_image", "ref_bbox"))
    init = model.init_params(jax.random.PRNGKey(0))
    imported = import_mobi_checkpoint(
        ld.state_dict(), channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2, 1), vae_resolution=32,
        vae_ch_mult=(1, 1, 2), vae_num_res_blocks=1, num_clip_layers=2,
    )
    params = merge_imported(init, imported)
    return model, params


def _batch_pair(b=2, seed=5):
    g = torch.Generator().manual_seed(seed)

    def t(*shape, lo=-1.0, hi=1.0):
        return torch.rand(*shape, generator=g) * (hi - lo) + lo

    batch_t = {
        "image": {
            "GT": t(b, 3, 32, 32),
            "inpaint_image": t(b, 3, 32, 32),
            "inpaint_mask": (torch.rand(b, 1, 32, 32, generator=g) > 0.5).float(),
            "cond": {
                "ref_image": t(b, 3, 32, 32),
                "ref_bbox": torch.rand(b, 8, 3, generator=g),
            },
        },
        "lidar": {
            "range_data": t(b, 2, 32, 32),
            "range_data_inpaint": t(b, 2, 32, 32),
            "range_mask": (torch.rand(b, 1, 32, 32, generator=g) > 0.5).float(),
            "cond": {
                "ref_image": None,  # filled below (shared with camera)
                "ref_bbox": torch.rand(b, 8, 3, generator=g),
            },
        },
    }
    batch_t["lidar"]["cond"]["ref_image"] = batch_t["image"]["cond"]["ref_image"]

    def to_jax(x, hwc):
        a = x.numpy()
        return jnp.asarray(a.transpose(0, 2, 3, 1) if hwc else a)

    batch_j = {
        "image": {
            "GT": to_jax(batch_t["image"]["GT"], True),
            "inpaint_image": to_jax(batch_t["image"]["inpaint_image"], True),
            "inpaint_mask": to_jax(batch_t["image"]["inpaint_mask"], True),
            "cond": {
                "ref_image": to_jax(batch_t["image"]["cond"]["ref_image"], True),
                "ref_bbox": jnp.asarray(batch_t["image"]["cond"]["ref_bbox"].numpy()),
            },
        },
        "lidar": {
            "range_data": to_jax(batch_t["lidar"]["range_data"], True),
            "range_data_inpaint": to_jax(
                batch_t["lidar"]["range_data_inpaint"], True
            ),
            "range_mask": to_jax(batch_t["lidar"]["range_mask"], True),
            "cond": {
                "ref_image": to_jax(batch_t["lidar"]["cond"]["ref_image"], True),
                "ref_bbox": jnp.asarray(batch_t["lidar"]["cond"]["ref_bbox"].numpy()),
            },
        },
    }
    return batch_t, batch_j


@pytest.fixture(scope="module")
def models():
    ld = _tiny_ld()
    model, params = _ours_from(ld)
    return ld, model, params


def _deterministic_encode(ld):
    """Route reference VAE encodes through the posterior mode."""
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution,
    )

    DiagonalGaussianDistribution.sample = (
        lambda self: self.mode()
    )


def test_get_input_latent_parity(models):
    ld, model, params = models
    _deterministic_encode(ld)
    batch_t, batch_j = _batch_pair()

    import copy

    with torch.no_grad():
        data_ref = ld.get_input(copy.deepcopy(batch_t), "inpaint",
                                force_c_encode=True)

    data = model.get_input(
        params, batch_j, jax.random.PRNGKey(0), encode_cond=True,
        deterministic=True,
    )
    z_ref = data_ref["z"].numpy()      # [2B, 9, 8, 8] interleaved
    z_ours = np.asarray(data["z"])     # [2B, 8, 8, 9]
    assert z_ours.shape == (4, 8, 8, 9)
    err = max_err(z_ours, z_ref.transpose(0, 2, 3, 1))
    assert err < 1e-4, f"get_input z max-err {err}"

    c_ref = data_ref["cond"].numpy()   # [2B, 2, CTX]
    c_ours = np.asarray(data["cond"])
    err_c = max_err(c_ours, c_ref)
    assert err_c < 1e-4, f"get_input cond max-err {err_c}"


def test_learned_conditioning_parity(models):
    ld, model, params = models
    batch_t, batch_j = _batch_pair(seed=9)
    with torch.no_grad():
        c_ref = ld.get_learned_conditioning(
            {k: v for k, v in batch_t["image"]["cond"].items()}
        ).numpy()
    c_ours = np.asarray(
        model.get_learned_conditioning(params, batch_j["image"]["cond"])
    )
    err = max_err(c_ours, c_ref)
    assert err < 1e-4, f"conditioning max-err {err}"


def test_p_losses_parity(models):
    ld, model, params = models
    _deterministic_encode(ld)
    batch_t, batch_j = _batch_pair(seed=11)

    import copy

    with torch.no_grad():
        data_ref = ld.get_input(copy.deepcopy(batch_t), "inpaint",
                                force_c_encode=True)
        zr = data_ref["z"]
        g = torch.Generator().manual_seed(3)
        t = torch.randint(0, 1000, (zr.shape[0],), generator=g)
        noise = torch.randn(zr[:, :4].shape, generator=g)
        loss_ref, loss_dict_ref = ld.p_losses(zr, data_ref["cond"], t,
                                              noise=noise)

    data = model.get_input(params, batch_j, jax.random.PRNGKey(0),
                           encode_cond=True, deterministic=True)
    loss, metrics = model.p_losses(
        params, data["z"], data["cond"], jnp.asarray(t.numpy()),
        jax.random.PRNGKey(0),
        noise=jnp.asarray(noise.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        float(loss), float(loss_ref), rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(metrics["loss_vlb"]), float(loss_dict_ref["val/loss_vlb"]),
        rtol=1e-4,
    )


def test_ddim_5step_sample_parity(models):
    ld, model, params = models
    _deterministic_encode(ld)
    from ldm.models.diffusion.ddim import DDIMSampler

    batch_t, batch_j = _batch_pair(seed=13)

    import copy

    with torch.no_grad():
        data_ref = ld.get_input(copy.deepcopy(batch_t), "inpaint",
                                force_c_encode=True)
        zr = data_ref["z"]
        g = torch.Generator().manual_seed(21)
        x_T = torch.randn(zr[:, :4].shape, generator=g)
        from test_golden_reference import _cpu_sampler

        sampler = _cpu_sampler(DDIMSampler, ld)
        samples, _ = sampler.sample(
            S=5, batch_size=zr.shape[0], shape=(4, 8, 8),
            conditioning=data_ref["cond"], x_T=x_T, eta=0.0, verbose=False,
            unconditional_guidance_scale=1.0, rest=zr[:, 4:],
        )

    data = model.get_input(params, batch_j, jax.random.PRNGKey(0),
                           encode_cond=True, deterministic=True)
    ours = model.sample(
        params, data, jax.random.PRNGKey(0), num_steps=5,
        guidance_scale=1.0, sampler="ddim",
        x_T=jnp.asarray(x_T.numpy().transpose(0, 2, 3, 1)),
    )
    err = max_err(ours, samples.numpy().transpose(0, 2, 3, 1))
    assert err < 5e-4, f"5-step DDIM sample max-err {err}"


def test_export_ckpt_loads_into_reference_consumer(models, tmp_path):
    """Close the export-interop loop against the REAL consumer: export a
    (perturbed, so nothing can pass by accident) mobi_tpu parameter tree
    with save_reference_checkpoint, load the .ckpt file into a FRESH
    in-process reference LatentDiffusion exactly the way the reference
    does (`load_state_dict(ckpt["state_dict"], strict=False)`,
    /root/reference/main.py:524-533, ddpm.py:196-212), then require the
    reference's 5-step DDIM from the loaded weights to match our sampler
    from the same params. Key-level round-trip tests
    (tests/test_export_torch.py) can't show the consumer accepts the file;
    this is the end-to-end proof of the interop claim."""
    _, model, params = models

    # distinct weights: a deterministic affine nudge of every float leaf —
    # the exported function must differ from the fixture ld's own weights
    def nudge(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x * 1.05 + 0.01
        return x

    params2 = jax.tree_util.tree_map(nudge, params)

    from mobi_tpu.export_torch import (
        export_mobi_checkpoint,
        save_reference_checkpoint,
    )

    sd = export_mobi_checkpoint(
        params2, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2, 1), vae_resolution=32,
        vae_ch_mult=(1, 1, 2), vae_num_res_blocks=1,
        schedule=model.schedule,
    )
    path = str(tmp_path / "tpu_trained.ckpt")
    save_reference_checkpoint(path, sd, global_step=5, epoch=1)

    ld2 = _tiny_ld()  # fresh consumer; never mutate the shared fixture
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    missing, unexpected = ld2.load_state_dict(
        ckpt["state_dict"], strict=False
    )
    assert not unexpected, f"reference rejected exported keys: {unexpected}"
    # every parameter and schedule buffer of the consumer must be fed by
    # the export (use_ema=False => no model_ema.* in either tree)
    assert not missing, f"exported checkpoint left consumer keys unfed: {missing}"
    ld2.eval()

    _deterministic_encode(ld2)
    from ldm.models.diffusion.ddim import DDIMSampler

    batch_t, batch_j = _batch_pair(seed=31)
    with torch.no_grad():
        import copy

        data_ref = ld2.get_input(copy.deepcopy(batch_t), "inpaint",
                                 force_c_encode=True)
        zr = data_ref["z"]
        g = torch.Generator().manual_seed(41)
        x_T = torch.randn(zr[:, :4].shape, generator=g)
        from test_golden_reference import _cpu_sampler

        sampler = _cpu_sampler(DDIMSampler, ld2)
        samples, _ = sampler.sample(
            S=5, batch_size=zr.shape[0], shape=(4, 8, 8),
            conditioning=data_ref["cond"], x_T=x_T, eta=0.0, verbose=False,
            unconditional_guidance_scale=1.0, rest=zr[:, 4:],
        )

    data = model.get_input(params2, batch_j, jax.random.PRNGKey(0),
                           encode_cond=True, deterministic=True)
    ours = model.sample(
        params2, data, jax.random.PRNGKey(0), num_steps=5,
        guidance_scale=1.0, sampler="ddim",
        x_T=jnp.asarray(x_T.numpy().transpose(0, 2, 3, 1)),
    )
    err = max_err(ours, samples.numpy().transpose(0, 2, 3, 1))
    assert err < 5e-4, f"consumer-loaded 5-step DDIM max-err {err}"

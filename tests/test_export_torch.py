"""Checkpoint exporter: the exact inverse of import_torch.

Contracts:
  * import(export(params)) is BIT-equal to params for every sub-tree
    (UNet, both VAEs, cond stage, proj_out, vectors).
  * export(import(sd)) reproduces a reference-shaped state dict
    key-for-key and value-for-value (fabricated with the same generators
    the import tests use), so a TPU-trained model round-trips into the
    layout the reference's load_state_dict consumes
    (/root/reference/main.py:524-533, ddpm.py:196-212).
  * EMA shadows land under model_ema.* with the LitEma flat-name scheme
    (ldm/modules/ema.py:16-21) and extract_ema_state_dict reads them back.
  * save_reference_checkpoint writes a torch .ckpt whose state_dict torch
    reloads identically.
"""
import jax
import numpy as np
import pytest
import torch

from mobi_tpu.export_torch import (
    export_cond_stage,
    export_mobi_checkpoint,
    export_unet,
    export_vae,
    save_reference_checkpoint,
    schedule_buffers,
)
from mobi_tpu.import_torch import (
    extract_ema_state_dict,
    import_cond_stage,
    import_mobi_checkpoint,
    import_unet,
    import_vae,
    to_numpy_state_dict,
)
from tests.test_import_torch import (
    torch_unet_state_dict,
    torch_vae_state_dict,
    tree_paths,
)

UNET_KW = dict(channel_mult=(1, 2), num_res_blocks=1,
               attention_resolutions=(2, 1))
VAE_KW = dict(ch_mult=(1, 2), num_res_blocks=1, resolution=32)


def assert_tree_bitequal(a, b, prefix=""):
    pa, pb = tree_paths(a), tree_paths(b)
    assert set(pa) == set(pb), (
        f"{prefix}: missing={sorted(set(pa) - set(pb))[:6]} "
        f"extra={sorted(set(pb) - set(pa))[:6]}"
    )
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    for path, va in flat_a:
        vb = flat_b[path]
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb), err_msg=f"{prefix}{path}"
        )


def assert_sd_equal(got, want, prefix=""):
    assert set(got) == set(want), (
        f"{prefix}: missing={sorted(set(want) - set(got))[:6]} "
        f"extra={sorted(set(got) - set(want))[:6]}"
    )
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=f"{prefix}{k}"
        )


def test_unet_roundtrip_both_directions():
    sd = to_numpy_state_dict(torch_unet_state_dict())
    params = import_unet(sd, **UNET_KW)
    # export(import(sd)) == sd
    assert_sd_equal(export_unet(params, **UNET_KW), sd, "unet sd: ")
    # import(export(params)) == params
    assert_tree_bitequal(
        import_unet(export_unet(params, **UNET_KW), **UNET_KW), params,
        "unet tree: ",
    )


@pytest.mark.parametrize("lidar_adapter", [False, True])
def test_vae_roundtrip_both_directions(lidar_adapter):
    io_ch = 2 if lidar_adapter else 3
    sd = to_numpy_state_dict(
        torch_vae_state_dict(in_ch=io_ch, out_ch=io_ch,
                             lidar_adapter=lidar_adapter)
    )
    params = import_vae(sd, lidar_adapter=lidar_adapter, **VAE_KW)
    assert_sd_equal(
        export_vae(params, lidar_adapter=lidar_adapter, **VAE_KW), sd,
        "vae sd: ",
    )
    assert_tree_bitequal(
        import_vae(
            export_vae(params, lidar_adapter=lidar_adapter, **VAE_KW),
            lidar_adapter=lidar_adapter, **VAE_KW,
        ),
        params, "vae tree: ",
    )


def torch_cond_state_dict(width=32, layers=2, heads=4):
    """Reference-shaped cond_stage_model state dict: tiny HF CLIP vision
    tower + xf mapper + final_ln + bbox embedder."""
    transformers = pytest.importorskip("transformers")
    cfg = transformers.CLIPVisionConfig(
        hidden_size=width, intermediate_size=width * 4,
        num_hidden_layers=layers, num_attention_heads=heads,
        image_size=32, patch_size=16, hidden_act="quick_gelu",
    )
    clip = transformers.CLIPVisionModel(cfg)
    sd = {}
    for k, v in clip.state_dict().items():
        # position_ids is a non-weight HF buffer the importer ignores
        if k.startswith("vision_model.") and "position_ids" not in k:
            sd[f"transformer.{k}"] = v
    g = torch.Generator().manual_seed(7)

    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.02
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.01

    def ln(name, c):
        sd[f"{name}.weight"] = torch.randn(c, generator=g) * 0.02 + 1
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.01

    for i in range(2):  # mapper depth 2
        r = f"mapper.resblocks.{i}"
        lin(f"{r}.attn.c_qkv", width, width * 3)
        lin(f"{r}.attn.c_proj", width, width)
        lin(f"{r}.mlp.c_fc", width, width * 4)
        lin(f"{r}.mlp.c_proj", width * 4, width)
        ln(f"{r}.ln_1", width)
        ln(f"{r}.ln_2", width)
    ln("final_ln", width)
    lin("bbox_embedder.bbox_proj", 216, 768)
    lin("bbox_embedder.second_linear.0", 768, 512)
    lin("bbox_embedder.second_linear.2", 512, 512)
    lin("bbox_embedder.second_linear.4", 512, 768)
    return sd


def test_cond_stage_roundtrip_both_directions():
    sd = to_numpy_state_dict(torch_cond_state_dict())
    params = import_cond_stage(sd, num_clip_layers=2)
    assert_sd_equal(export_cond_stage(params), sd, "cond sd: ")
    assert_tree_bitequal(
        import_cond_stage(export_cond_stage(params), num_clip_layers=2),
        params, "cond tree: ",
    )


def full_reference_sd():
    """A full LatentDiffusion-shaped state dict (all prefixes)."""
    sd = {}
    for k, v in torch_unet_state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v
    for k, v in torch_vae_state_dict().items():
        sd[f"first_stage_model.{k}"] = v
    for k, v in torch_vae_state_dict(
        in_ch=2, out_ch=2, lidar_adapter=True
    ).items():
        sd[f"lidar_stage_model.{k}"] = v
    for k, v in torch_cond_state_dict().items():
        sd[f"cond_stage_model.{k}"] = v
    g = torch.Generator().manual_seed(9)
    sd["proj_out.weight"] = torch.randn(768, 1024, generator=g) * 0.02
    sd["proj_out.bias"] = torch.zeros(768)
    sd["learnable_vector"] = torch.randn(1, 1, 768, generator=g)
    sd["bbox_uncond_vector"] = torch.randn(1, 1, 768, generator=g)
    return sd


FULL_KW = dict(
    channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(2, 1),
    vae_resolution=32, vae_ch_mult=(1, 2), vae_num_res_blocks=1,
)


def test_full_checkpoint_roundtrip():
    sd = to_numpy_state_dict(full_reference_sd())
    params = import_mobi_checkpoint(sd, num_clip_layers=2, **FULL_KW)
    out = export_mobi_checkpoint(params, **FULL_KW)
    assert_sd_equal(out, sd, "full: ")
    assert_tree_bitequal(
        import_mobi_checkpoint(out, num_clip_layers=2, **FULL_KW),
        params, "full tree: ",
    )


def test_ema_export_readable_by_importer():
    """model_ema.* buffers written with the LitEma flat-name scheme are
    recovered by extract_ema_state_dict: the EMA-substituted 'model.*'
    entries equal the shadow values."""
    sd = to_numpy_state_dict(full_reference_sd())
    params = import_mobi_checkpoint(sd, num_clip_layers=2, **FULL_KW)
    # a distinguishable shadow: live unet values + 1
    ema_unet = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 1.0, params["unet"]
    )
    out = export_mobi_checkpoint(
        params, ema_unet=ema_unet, ema_num_updates=123, **FULL_KW
    )
    assert int(out["model_ema.num_updates"]) == 123
    ema_sd, num_updates = extract_ema_state_dict(out)
    assert int(num_updates) == 123
    for k, v in out.items():
        if k.startswith("model.diffusion_model."):
            np.testing.assert_array_equal(
                ema_sd[k], v + 1.0, err_msg=f"ema substitution at {k}"
            )


def test_schedule_buffers_match_reference_names_and_values():
    from mobi_tpu.ops.schedules import DiffusionSchedule

    sched = DiffusionSchedule.create(20, "linear", 0.00085, 0.0120)
    bufs = schedule_buffers(sched)
    assert set(bufs) == {
        "betas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
        # lvlb_weights deliberately absent: persistent=False in the
        # reference (ddpm.py:178), never part of a reference state dict
    }
    np.testing.assert_allclose(
        bufs["sqrt_alphas_cumprod"], np.sqrt(bufs["alphas_cumprod"]),
        rtol=1e-6,
    )


TINY_YAML = """
image_height: 32
image_width: 32
range_height: 32
range_width: 32
precision: fp32
model:
  params:
    use_camera: true
    use_lidar: true
    unet_config:
      params:
        model_channels: 32
        channel_mult: [1, 2]
        num_res_blocks: 1
        attention_resolutions: [2, 1]
        num_heads: 4
        context_dim: 64
    first_stage_config:
      params:
        embed_dim: 4
        ddconfig:
          ch: 16
          ch_mult: [1, 2]
          num_res_blocks: 1
"""


def test_export_checkpoint_cli_roundtrip(tmp_path):
    """scripts/export_checkpoint.py end-to-end on the torch-input path:
    import a reference-shaped .ckpt, re-export, and get the same state
    dict back (plus the DDPM schedule buffers) in a file torch reloads —
    the artifact the reference's --pretrained_model consumes."""
    from scripts.export_checkpoint import main as export_main

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)
    sd = to_numpy_state_dict(full_reference_sd())
    src = tmp_path / "src.ckpt"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}},
        str(src),
    )
    out_path = tmp_path / "exported.ckpt"
    export_main(["--config", str(cfg_path), "--ckpt", str(src),
                 "--out", str(out_path)])

    ckpt = torch.load(str(out_path), map_location="cpu")
    got = to_numpy_state_dict(ckpt["state_dict"])
    sched_names = set(got) - set(sd)
    assert "betas" in sched_names and "lvlb_weights" not in sched_names
    # the cond-stage CLIP layers beyond the tiny fabricator's 2 don't
    # exist in the source; everything present must round-trip exactly
    for k in sd:
        np.testing.assert_array_equal(got[k], sd[k], err_msg=k)
    assert set(sd) <= set(got)


def test_save_reference_checkpoint_torch_reload(tmp_path):
    sd = to_numpy_state_dict(full_reference_sd())
    params = import_mobi_checkpoint(sd, num_clip_layers=2, **FULL_KW)
    out = export_mobi_checkpoint(params, **FULL_KW)
    path = tmp_path / "exported.ckpt"
    save_reference_checkpoint(str(path), out, global_step=77, epoch=3)

    ckpt = torch.load(str(path), map_location="cpu")
    assert ckpt["global_step"] == 77 and ckpt["epoch"] == 3
    reloaded = to_numpy_state_dict(ckpt["state_dict"])
    assert_sd_equal(reloaded, sd, "saved ckpt: ")

"""Export mobi_tpu parameter pytrees back to the reference's Lightning
checkpoint layout — the exact inverse of `import_torch`.

The reference consumes checkpoints through
`model.load_state_dict(ckpt["state_dict"], strict=False)`
(/root/reference/main.py:524-533, scripts/inference_test_bench.py:150-167,
ldm/models/diffusion/ddpm.py:196-212), so a TPU-trained model exported here
drops straight into `--pretrained_model` / `load_model_from_config` on the
reference side. Key prefixes written:

  * `model.diffusion_model.*`  — UNet (openaimodel.py construction order)
  * `first_stage_model.*`      — camera AutoencoderKL
  * `lidar_stage_model.*`      — range AutoencoderKL (lidar_adapter convs)
  * `cond_stage_model.*`       — CLIP tower + mapper + final_ln + bbox MLP
  * `proj_out.*`, `learnable_vector`, `bbox_uncond_vector`
  * `model_ema.*`              — LitEma shadow buffers (dots stripped from
    the tracked name, ldm/modules/ema.py:16-21) + num_updates/decay
  * DDPM schedule buffers (betas, alphas_cumprod, ...) when a schedule is
    passed (register_schedule names, ddpm.py:127-179)

Tensor layout conversions are the inverses of import_torch's:
  kernel [in, out] -> Linear weight [out, in]
  kernel [kh, kw, i, o] -> Conv2d weight [o, i, kh, kw]
  scale/bias -> Norm weight/bias

The walks mirror import_torch's walk functions one-for-one; structural
branches (skip connections, adapter blocks, transformer depth, mapper
depth) are probed on the FLAX tree instead of the torch key set. Round-trip
contract (tests/test_export_torch.py): `import(export(params)) == params`
bit-equal, and `export(import(sd))` reproduces a reference-shaped state
dict key-for-key, value-for-value.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

Params = Dict[str, Any]
StateDict = Dict[str, np.ndarray]


# --------------------------------------------------------------------- utils
def _inv_linear(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(k).T)


def _inv_conv(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _get(tree: Params, path: str):
    """'a/b/c' -> leaf, or None when any component is absent."""
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _put_linear(out: StateDict, params: Params, src: str, dst: str) -> None:
    """flax Dense wrapper `src/Dense_0` -> torch Linear `dst.{weight,bias}`."""
    k = _get(params, f"{src}/Dense_0/kernel")
    assert k is not None, f"missing Dense kernel at {src}"
    out[f"{dst}.weight"] = _inv_linear(k)
    b = _get(params, f"{src}/Dense_0/bias")
    if b is not None:
        out[f"{dst}.bias"] = np.asarray(b)


def _put_conv(out: StateDict, params: Params, src: str, dst: str) -> None:
    k = _get(params, f"{src}/Conv_0/kernel")
    assert k is not None, f"missing Conv kernel at {src}"
    out[f"{dst}.weight"] = _inv_conv(k)
    b = _get(params, f"{src}/Conv_0/bias")
    if b is not None:
        out[f"{dst}.bias"] = np.asarray(b)


def _put_norm(out: StateDict, params: Params, src: str, dst: str) -> None:
    s = _get(params, f"{src}/scale")
    assert s is not None, f"missing norm scale at {src}"
    out[f"{dst}.weight"] = np.asarray(s)
    out[f"{dst}.bias"] = np.asarray(_get(params, f"{src}/bias"))


# ----------------------------------------------------------------- VAE
def export_vae(
    params: Params,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    resolution: int = 512,
    lidar_adapter: bool = False,
) -> StateDict:
    """AutoencoderKL params -> bare reference state dict (inverse of
    import_torch.import_vae; same construction walk, model.py:368-630)."""
    out: StateDict = {}

    def resblock(src: str, dst: str):
        _put_norm(out, params, f"{src}/norm1", f"{dst}.norm1")
        _put_conv(out, params, f"{src}/conv1", f"{dst}.conv1")
        _put_norm(out, params, f"{src}/norm2", f"{dst}.norm2")
        _put_conv(out, params, f"{src}/conv2", f"{dst}.conv2")
        if _get(params, f"{src}/nin_shortcut") is not None:
            _put_conv(out, params, f"{src}/nin_shortcut", f"{dst}.nin_shortcut")

    def attnblock(src: str, dst: str):
        _put_norm(out, params, f"{src}/norm", f"{dst}.norm")
        for n in ("q", "k", "v", "proj_out"):
            _put_conv(out, params, f"{src}/{n}", f"{dst}.{n}")

    # encoder
    if lidar_adapter:
        _put_conv(out, params, "encoder/conv_in_lidar", "encoder.conv_in_lidar")
        resblock("encoder/res_block_lidar1", "encoder.res_block_lidar1")
        resblock("encoder/res_block_lidar2", "encoder.res_block_lidar2")
    else:
        _put_conv(out, params, "encoder/conv_in", "encoder.conv_in")

    curr_res = resolution
    for lvl in range(len(ch_mult)):
        for blk in range(num_res_blocks):
            resblock(
                f"encoder/down_{lvl}_block_{blk}", f"encoder.down.{lvl}.block.{blk}"
            )
            if curr_res in attn_resolutions:
                attnblock(
                    f"encoder/down_{lvl}_attn_{blk}", f"encoder.down.{lvl}.attn.{blk}"
                )
        if lvl != len(ch_mult) - 1:
            _put_conv(
                out, params, f"encoder/down_{lvl}_downsample/conv",
                f"encoder.down.{lvl}.downsample.conv",
            )
            curr_res //= 2

    resblock("encoder/mid_block_1", "encoder.mid.block_1")
    attnblock("encoder/mid_attn_1", "encoder.mid.attn_1")
    resblock("encoder/mid_block_2", "encoder.mid.block_2")
    _put_norm(out, params, "encoder/norm_out", "encoder.norm_out")
    _put_conv(out, params, "encoder/conv_out", "encoder.conv_out")

    # decoder
    _put_conv(out, params, "decoder/conv_in", "decoder.conv_in")
    resblock("decoder/mid_block_1", "decoder.mid.block_1")
    attnblock("decoder/mid_attn_1", "decoder.mid.attn_1")
    resblock("decoder/mid_block_2", "decoder.mid.block_2")

    curr_res = resolution // 2 ** (len(ch_mult) - 1)
    for lvl in reversed(range(len(ch_mult))):
        for blk in range(num_res_blocks + 1):
            resblock(
                f"decoder/up_{lvl}_block_{blk}", f"decoder.up.{lvl}.block.{blk}"
            )
            if curr_res in attn_resolutions:
                attnblock(
                    f"decoder/up_{lvl}_attn_{blk}", f"decoder.up.{lvl}.attn.{blk}"
                )
        if lvl != 0:
            _put_conv(
                out, params, f"decoder/up_{lvl}_upsample/conv",
                f"decoder.up.{lvl}.upsample.conv",
            )
            curr_res *= 2

    if lidar_adapter:
        resblock("decoder/res_block_lidar1", "decoder.res_block_lidar1")
        _put_norm(out, params, "decoder/norm_out_lidar1", "decoder.norm_out_lidar1")
        resblock("decoder/res_block_lidar2", "decoder.res_block_lidar2")
        _put_norm(out, params, "decoder/norm_out_lidar2", "decoder.norm_out_lidar2")
        _put_conv(out, params, "decoder/conv_out_lidar", "decoder.conv_out_lidar")
    else:
        _put_norm(out, params, "decoder/norm_out", "decoder.norm_out")
        _put_conv(out, params, "decoder/conv_out", "decoder.conv_out")

    _put_conv(out, params, "quant_conv", "quant_conv")
    _put_conv(out, params, "post_quant_conv", "post_quant_conv")
    return out


# ----------------------------------------------------------------- UNet
def export_unet(
    params: Params,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
) -> StateDict:
    """UNetModel params -> `model.diffusion_model.`-strippable state dict
    (inverse of import_torch.import_unet; openaimodel.py:664-843 order)."""
    out: StateDict = {}

    def dense(src, dst):
        _put_linear(out, params, src, dst)

    def conv(src, dst):
        _put_conv(out, params, src, dst)

    def norm(src, dst):
        _put_norm(out, params, src, dst)

    def resblock(src, dst):
        norm(f"{src}/in_norm", f"{dst}.in_layers.0")
        conv(f"{src}/in_conv", f"{dst}.in_layers.2")
        dense(f"{src}/emb_proj", f"{dst}.emb_layers.1")
        norm(f"{src}/out_norm", f"{dst}.out_layers.0")
        conv(f"{src}/out_conv", f"{dst}.out_layers.3")
        if _get(params, f"{src}/skip_connection") is not None:
            conv(f"{src}/skip_connection", f"{dst}.skip_connection")

    def cross_attention(src, dst):
        dense(f"{src}/to_q", f"{dst}.to_q")
        dense(f"{src}/to_k", f"{dst}.to_k")
        dense(f"{src}/to_v", f"{dst}.to_v")
        dense(f"{src}/to_out", f"{dst}.to_out.0")

    def transformer(src, dst):
        norm(f"{src}/norm", f"{dst}.norm")
        conv(f"{src}/proj_in", f"{dst}.proj_in")
        conv(f"{src}/proj_out", f"{dst}.proj_out")
        d = 0
        while _get(params, f"{src}/block_{d}/norm1/scale") is not None:
            bsrc = f"{src}/block_{d}"
            bdst = f"{dst}.transformer_blocks.{d}"
            cross_attention(f"{bsrc}/attn1", f"{bdst}.attn1")
            cross_attention(f"{bsrc}/attn2", f"{bdst}.attn2")
            for n in ("norm1", "norm2", "norm3"):
                norm(f"{bsrc}/{n}", f"{bdst}.{n}")
            dense(f"{bsrc}/ff/proj", f"{bdst}.ff.net.0.proj")
            dense(f"{bsrc}/ff/out", f"{bdst}.ff.net.2")
            if _get(params, f"{bsrc}/cond_adapter_norm") is not None:
                norm(f"{bsrc}/cond_adapter_norm", f"{bdst}.cond_adapter_norm")
                cross_attention(
                    f"{bsrc}/cond_adapter_attn", f"{bdst}.cond_adapter_attn"
                )
                dense(
                    f"{bsrc}/cond_adapter_connector",
                    f"{bdst}.cond_adapter_connector",
                )
            if _get(params, f"{bsrc}/cross_modal_norm_camera") is not None:
                for m in ("camera", "lidar"):
                    norm(
                        f"{bsrc}/cross_modal_norm_{m}",
                        f"{bdst}.cross_modal_norm_{m}",
                    )
                    cross_attention(
                        f"{bsrc}/cross_modal_attn_{m}",
                        f"{bdst}.cross_modal_attn_{m}",
                    )
                    dense(
                        f"{bsrc}/cross_modal_connector_{m}",
                        f"{bdst}.cross_modal_connector_{m}",
                    )
            d += 1

    dense("time_embed_0", "time_embed.0")
    dense("time_embed_2", "time_embed.2")
    conv("input_blocks_0_conv", "input_blocks.0.0")

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            resblock(f"input_blocks_{idx}_res", f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                transformer(f"input_blocks_{idx}_attn", f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            conv(f"input_blocks_{idx}_down/op", f"input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2

    resblock("middle_block_0", "middle_block.0")
    transformer("middle_block_1", "middle_block.1")
    resblock("middle_block_2", "middle_block.2")

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            resblock(f"output_blocks_{idx}_res", f"output_blocks.{idx}.0")
            sub = 1
            if ds in attention_resolutions:
                transformer(f"output_blocks_{idx}_attn", f"output_blocks.{idx}.{sub}")
                sub += 1
            if level and i == num_res_blocks:
                conv(f"output_blocks_{idx}_up/conv", f"output_blocks.{idx}.{sub}.conv")
                ds //= 2
            idx += 1

    norm("out_norm", "out.0")
    conv("out_conv", "out.2")
    return out


# ----------------------------------------------------------------- cond
def export_cond_stage(params: Params) -> StateDict:
    """CondStageModel params -> `cond_stage_model.`-strippable state dict
    (inverse of import_torch.import_cond_stage)."""
    out: StateDict = {}
    vm = "transformer.vision_model"
    tower = params.get("transformer")
    if tower is not None:
        out[f"{vm}.embeddings.patch_embedding.weight"] = _inv_conv(
            tower["patch_embedding"]["kernel"]
        )
        out[f"{vm}.embeddings.class_embedding"] = np.asarray(
            tower["class_embedding"]
        )
        out[f"{vm}.embeddings.position_embedding.weight"] = np.asarray(
            tower["position_embedding"]
        )
        for ln_src, ln_dst in (
            ("pre_layernorm", "pre_layrnorm"),  # HF's typo'd key
            ("post_layernorm", "post_layernorm"),
        ):
            out[f"{vm}.{ln_dst}.weight"] = np.asarray(tower[ln_src]["scale"])
            out[f"{vm}.{ln_dst}.bias"] = np.asarray(tower[ln_src]["bias"])
        i = 0
        while f"layer_{i}" in tower:
            layer = tower[f"layer_{i}"]
            ldst = f"{vm}.encoder.layers.{i}"
            for n in ("layer_norm1", "layer_norm2"):
                out[f"{ldst}.{n}.weight"] = np.asarray(layer[n]["scale"])
                out[f"{ldst}.{n}.bias"] = np.asarray(layer[n]["bias"])
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                d = layer["self_attn"][n]["Dense_0"]
                out[f"{ldst}.self_attn.{n}.weight"] = _inv_linear(d["kernel"])
                out[f"{ldst}.self_attn.{n}.bias"] = np.asarray(d["bias"])
            for n in ("fc1", "fc2"):
                d = layer[n]["Dense_0"]
                out[f"{ldst}.mlp.{n}.weight"] = _inv_linear(d["kernel"])
                out[f"{ldst}.mlp.{n}.bias"] = np.asarray(d["bias"])
            i += 1

        mapper = params.get("mapper", {})
        i = 0
        while f"resblock_{i}" in mapper:
            blk = mapper[f"resblock_{i}"]
            rdst = f"mapper.resblocks.{i}"
            for src, dst in (
                ("c_qkv", f"{rdst}.attn.c_qkv"),
                ("c_proj", f"{rdst}.attn.c_proj"),
                ("c_fc", f"{rdst}.mlp.c_fc"),
                ("mlp_c_proj", f"{rdst}.mlp.c_proj"),
            ):
                d = blk[src]["Dense_0"]
                out[f"{dst}.weight"] = _inv_linear(d["kernel"])
                out[f"{dst}.bias"] = np.asarray(d["bias"])
            for n in ("ln_1", "ln_2"):
                out[f"{rdst}.{n}.weight"] = np.asarray(blk[n]["scale"])
                out[f"{rdst}.{n}.bias"] = np.asarray(blk[n]["bias"])
            i += 1
        if "final_ln" in params:
            out["final_ln.weight"] = np.asarray(params["final_ln"]["scale"])
            out["final_ln.bias"] = np.asarray(params["final_ln"]["bias"])

    if "bbox_embedder" in params:
        be = params["bbox_embedder"]
        for src, dst in (
            ("bbox_proj", "bbox_embedder.bbox_proj"),
            ("linear_1", "bbox_embedder.second_linear.0"),
            ("linear_2", "bbox_embedder.second_linear.2"),
            ("linear_3", "bbox_embedder.second_linear.4"),
        ):
            d = be[src]["Dense_0"]
            out[f"{dst}.weight"] = _inv_linear(d["kernel"])
            out[f"{dst}.bias"] = np.asarray(d["bias"])
    return out


# ----------------------------------------------------------- full checkpoint
def schedule_buffers(schedule) -> StateDict:
    """DDPM registered buffers from a DiffusionSchedule (reference
    register_schedule names, ddpm.py:127-179) — the reference re-derives
    these at construction, but writing them keeps the exported state dict
    key-complete for strict loads."""
    names = (
        "betas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
        # NOT lvlb_weights: the reference registers it persistent=False
        # (ddpm.py:178), so it never appears in a reference state dict and
        # the consumer's load_state_dict reports it as an unexpected key
        # (caught by test_export_ckpt_loads_into_reference_consumer).
    )
    return {n: np.asarray(getattr(schedule, n), np.float32) for n in names}


def export_mobi_checkpoint(
    params: Params,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    vae_resolution: int = 512,
    vae_ch_mult: Sequence[int] = (1, 2, 4, 4),
    vae_num_res_blocks: int = 2,
    ema_unet: Optional[Params] = None,
    ema_num_updates: Optional[int] = None,
    ema_decay: float = 0.9999,
    schedule=None,
) -> StateDict:
    """mobi_tpu params pytree -> full reference LatentDiffusion state dict
    (inverse of import_torch.import_mobi_checkpoint).

    `ema_unet` (an EMA shadow of params['unet'], e.g. EmaState.ema_params)
    adds `model_ema.*` buffers named by the reference LitEma convention:
    the tracked parameter's `model.`-stripped name with dots removed
    (ldm/modules/ema.py:16-21), plus num_updates/decay.
    """
    out: StateDict = {}

    if "unet" in params:
        for k, v in export_unet(
            params["unet"], channel_mult, num_res_blocks,
            attention_resolutions,
        ).items():
            out[f"model.diffusion_model.{k}"] = v

    if "vae_camera" in params:
        for k, v in export_vae(
            params["vae_camera"], ch_mult=vae_ch_mult,
            num_res_blocks=vae_num_res_blocks, resolution=vae_resolution,
        ).items():
            out[f"first_stage_model.{k}"] = v

    if "vae_lidar" in params:
        for k, v in export_vae(
            params["vae_lidar"], ch_mult=vae_ch_mult,
            num_res_blocks=vae_num_res_blocks, resolution=vae_resolution,
            lidar_adapter=True,
        ).items():
            out[f"lidar_stage_model.{k}"] = v

    if "cond" in params:
        for k, v in export_cond_stage(params["cond"]).items():
            out[f"cond_stage_model.{k}"] = v

    if "proj_out" in params:
        out["proj_out.weight"] = _inv_linear(params["proj_out"]["kernel"])
        out["proj_out.bias"] = np.asarray(params["proj_out"]["bias"])
    if "learnable_vector" in params:
        out["learnable_vector"] = np.asarray(params["learnable_vector"])
    if "bbox_uncond_vector" in params:
        out["bbox_uncond_vector"] = np.asarray(params["bbox_uncond_vector"])

    if ema_unet is not None:
        for k, v in export_unet(
            ema_unet, channel_mult, num_res_blocks, attention_resolutions
        ).items():
            flat = f"diffusion_model.{k}".replace(".", "")
            out[f"model_ema.{flat}"] = v
        out["model_ema.num_updates"] = np.asarray(
            int(ema_num_updates or 0), np.int64
        )
        out["model_ema.decay"] = np.asarray(ema_decay, np.float32)

    if schedule is not None:
        out.update(schedule_buffers(schedule))
    return out


def export_from_config(model_cfg, params: Params, **kwargs) -> StateDict:
    """export_mobi_checkpoint with the structure arguments pulled from a
    MobiConfig (the same fields import sites pass — e.g.
    scripts/serve.py:181-187)."""
    return export_mobi_checkpoint(
        params,
        channel_mult=tuple(model_cfg.unet_channel_mult),
        num_res_blocks=model_cfg.unet_num_res_blocks,
        attention_resolutions=tuple(model_cfg.unet_attention_resolutions),
        vae_resolution=model_cfg.image_height,
        vae_ch_mult=tuple(model_cfg.vae_ch_mult),
        vae_num_res_blocks=model_cfg.vae_num_res_blocks,
        **kwargs,
    )


def save_reference_checkpoint(
    path: str,
    state_dict: StateDict,
    global_step: int = 0,
    epoch: int = 0,
) -> None:
    """Write a Lightning-shaped .ckpt the reference's torch.load consumers
    open directly (load_model_from_config reads ckpt['state_dict'];
    inference_test_bench.py:150-167)."""
    import torch

    torch.save(
        {
            "state_dict": {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()
            },
            "global_step": int(global_step),
            "epoch": int(epoch),
        },
        path,
    )

"""Torch checkpoint importer: maps the reference's Lightning state dicts onto
mobi_tpu parameter pytrees.

Supports the three published artifacts (reference scripts/download_models.sh):
  * Paint-by-Example `model.ckpt` / MObI `mobi_nuscenes_epoch28.ckpt` —
    full LatentDiffusion state dicts with prefixes
    `model.diffusion_model.*` (UNet), `first_stage_model.*` (camera VAE),
    `lidar_stage_model.*` (range VAE), `cond_stage_model.*` (CLIP+mapper+bbox),
    `proj_out.*`, `learnable_vector`, `bbox_uncond_vector`.
  * `range_autoencoder.ckpt` — a bare AutoencoderKL state dict.

Tensor layout conversions:
  * Linear weight [out, in]   -> kernel [in, out]
  * Conv2d weight [o, i, kh, kw] -> kernel [kh, kw, i, o]
  * Norm weight/bias          -> scale/bias
The flax key names were chosen so the mapping is mechanical; see
`unet_key_map` / `vae_key_map` / `cond_key_map` for the full correspondence
(they are also exercised by tests/test_import_torch.py against synthetic
state dicts with reference-shaped tensors).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

Params = Dict[str, Any]


# --------------------------------------------------------------------- utils
def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Params, path: Sequence[str], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _assign_linear(out: Params, dst: str, sd: Dict[str, np.ndarray], src: str):
    """torch Linear `src.{weight,bias}` -> flax Dense wrapper `dst/Dense_0`."""
    _set(out, dst.split("/") + ["Dense_0", "kernel"], _t_linear(sd[f"{src}.weight"]))
    if f"{src}.bias" in sd:
        _set(out, dst.split("/") + ["Dense_0", "bias"], sd[f"{src}.bias"])


def _assign_conv(out: Params, dst: str, sd: Dict[str, np.ndarray], src: str):
    _set(out, dst.split("/") + ["Conv_0", "kernel"], _t_conv(sd[f"{src}.weight"]))
    if f"{src}.bias" in sd:
        _set(out, dst.split("/") + ["Conv_0", "bias"], sd[f"{src}.bias"])


def _assign_norm(out: Params, dst: str, sd: Dict[str, np.ndarray], src: str):
    _set(out, dst.split("/") + ["scale"], sd[f"{src}.weight"])
    _set(out, dst.split("/") + ["bias"], sd[f"{src}.bias"])


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def to_numpy_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """torch tensors -> numpy (accepts an already-numpy dict)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


# ----------------------------------------------------------------- VAE
def import_vae(
    sd: Dict[str, np.ndarray],
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    resolution: int = 512,
    lidar_adapter: bool = False,
) -> Params:
    """Bare AutoencoderKL state dict -> mobi_tpu AutoencoderKL params.

    Mirrors the construction loops of reference model.py:368-630.
    """
    out: Params = {"encoder": {}, "decoder": {}}

    def resblock(dst: str, src: str):
        _assign_norm(out, f"{dst}/norm1", sd, f"{src}.norm1")
        _assign_conv(out, f"{dst}/conv1", sd, f"{src}.conv1")
        _assign_norm(out, f"{dst}/norm2", sd, f"{src}.norm2")
        _assign_conv(out, f"{dst}/conv2", sd, f"{src}.conv2")
        if f"{src}.nin_shortcut.weight" in sd:
            _assign_conv(out, f"{dst}/nin_shortcut", sd, f"{src}.nin_shortcut")

    def attnblock(dst: str, src: str):
        _assign_norm(out, f"{dst}/norm", sd, f"{src}.norm")
        for n in ("q", "k", "v", "proj_out"):
            _assign_conv(out, f"{dst}/{n}", sd, f"{src}.{n}")

    # encoder
    if lidar_adapter:
        _assign_conv(out, "encoder/conv_in_lidar", sd, "encoder.conv_in_lidar")
        resblock("encoder/res_block_lidar1", "encoder.res_block_lidar1")
        resblock("encoder/res_block_lidar2", "encoder.res_block_lidar2")
    else:
        _assign_conv(out, "encoder/conv_in", sd, "encoder.conv_in")

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
            _assign_conv(
                out, f"encoder/down_{lvl}_downsample/conv",
                sd, f"encoder.down.{lvl}.downsample.conv",
            )
            curr_res //= 2

    resblock("encoder/mid_block_1", "encoder.mid.block_1")
    attnblock("encoder/mid_attn_1", "encoder.mid.attn_1")
    resblock("encoder/mid_block_2", "encoder.mid.block_2")
    _assign_norm(out, "encoder/norm_out", sd, "encoder.norm_out")
    _assign_conv(out, "encoder/conv_out", sd, "encoder.conv_out")

    # decoder
    _assign_conv(out, "decoder/conv_in", sd, "decoder.conv_in")
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
            _assign_conv(
                out, f"decoder/up_{lvl}_upsample/conv",
                sd, f"decoder.up.{lvl}.upsample.conv",
            )
            curr_res *= 2

    if lidar_adapter:
        resblock("decoder/res_block_lidar1", "decoder.res_block_lidar1")
        _assign_norm(out, "decoder/norm_out_lidar1", sd, "decoder.norm_out_lidar1")
        resblock("decoder/res_block_lidar2", "decoder.res_block_lidar2")
        _assign_norm(out, "decoder/norm_out_lidar2", sd, "decoder.norm_out_lidar2")
        _assign_conv(out, "decoder/conv_out_lidar", sd, "decoder.conv_out_lidar")
    else:
        _assign_norm(out, "decoder/norm_out", sd, "decoder.norm_out")
        _assign_conv(out, "decoder/conv_out", sd, "decoder.conv_out")

    _assign_conv(out, "quant_conv", sd, "quant_conv")
    _assign_conv(out, "post_quant_conv", sd, "post_quant_conv")
    return out


# ----------------------------------------------------------------- UNet
def import_unet(
    sd: Dict[str, np.ndarray],
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
) -> Params:
    """`model.diffusion_model.*`-stripped state dict -> UNetModel params.

    Walks the same construction order as the reference
    (openaimodel.py:664-843); torch sub-indices within each
    TimestepEmbedSequential are 0 = ResBlock/conv, 1 = SpatialTransformer,
    final index = Up/Downsample.
    """
    out: Params = {}

    def dense(dst, src):
        _assign_linear(out, dst, sd, src)

    def conv(dst, src):
        _assign_conv(out, dst, sd, src)

    def norm(dst, src):
        _assign_norm(out, dst, sd, src)

    def layernorm(dst, src):
        norm(dst, src)

    def resblock(dst, src):
        norm(f"{dst}/in_norm", f"{src}.in_layers.0")
        conv(f"{dst}/in_conv", f"{src}.in_layers.2")
        dense(f"{dst}/emb_proj", f"{src}.emb_layers.1")
        norm(f"{dst}/out_norm", f"{src}.out_layers.0")
        conv(f"{dst}/out_conv", f"{src}.out_layers.3")
        if f"{src}.skip_connection.weight" in sd:
            conv(f"{dst}/skip_connection", f"{src}.skip_connection")

    def cross_attention(dst, src):
        dense(f"{dst}/to_q", f"{src}.to_q")
        dense(f"{dst}/to_k", f"{src}.to_k")
        dense(f"{dst}/to_v", f"{src}.to_v")
        dense(f"{dst}/to_out", f"{src}.to_out.0")

    def transformer(dst, src):
        norm(f"{dst}/norm", f"{src}.norm")
        conv(f"{dst}/proj_in", f"{src}.proj_in")
        conv(f"{dst}/proj_out", f"{src}.proj_out")
        d = 0
        while f"{src}.transformer_blocks.{d}.norm1.weight" in sd:
            bsrc = f"{src}.transformer_blocks.{d}"
            bdst = f"{dst}/block_{d}"
            cross_attention(f"{bdst}/attn1", f"{bsrc}.attn1")
            cross_attention(f"{bdst}/attn2", f"{bsrc}.attn2")
            for n in ("norm1", "norm2", "norm3"):
                layernorm(f"{bdst}/{n}", f"{bsrc}.{n}")
            dense(f"{bdst}/ff/proj", f"{bsrc}.ff.net.0.proj")
            dense(f"{bdst}/ff/out", f"{bsrc}.ff.net.2")
            if f"{bsrc}.cond_adapter_norm.weight" in sd:
                layernorm(f"{bdst}/cond_adapter_norm", f"{bsrc}.cond_adapter_norm")
                cross_attention(f"{bdst}/cond_adapter_attn", f"{bsrc}.cond_adapter_attn")
                dense(f"{bdst}/cond_adapter_connector", f"{bsrc}.cond_adapter_connector")
            if f"{bsrc}.cross_modal_norm_camera.weight" in sd:
                for m in ("camera", "lidar"):
                    layernorm(
                        f"{bdst}/cross_modal_norm_{m}", f"{bsrc}.cross_modal_norm_{m}"
                    )
                    cross_attention(
                        f"{bdst}/cross_modal_attn_{m}", f"{bsrc}.cross_modal_attn_{m}"
                    )
                    dense(
                        f"{bdst}/cross_modal_connector_{m}",
                        f"{bsrc}.cross_modal_connector_{m}",
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
def import_cond_stage(
    sd: Dict[str, np.ndarray], num_clip_layers: Optional[int] = None
) -> Params:
    """`cond_stage_model.*`-stripped dict -> CondStageModel params
    (CLIP tower + mapper + final_ln + bbox embedder).

    num_clip_layers defaults to however many encoder layers the state dict
    holds (24 for the reference's ViT-L/14)."""
    out: Params = {}
    vm = "transformer.vision_model"
    if num_clip_layers is None:
        num_clip_layers = 0
        while f"{vm}.encoder.layers.{num_clip_layers}.layer_norm1.weight" in sd:
            num_clip_layers += 1
    if f"{vm}.embeddings.class_embedding" in sd:
        tower: Params = {}
        _set(
            tower, ["patch_embedding", "kernel"],
            _t_conv(sd[f"{vm}.embeddings.patch_embedding.weight"]),
        )
        _set(tower, ["class_embedding"], sd[f"{vm}.embeddings.class_embedding"])
        _set(
            tower, ["position_embedding"],
            sd[f"{vm}.embeddings.position_embedding.weight"],
        )
        for ln_dst, ln_src in (
            ("pre_layernorm", "pre_layrnorm"),  # HF's typo'd key
            ("post_layernorm", "post_layernorm"),
        ):
            _set(tower, [ln_dst, "scale"], sd[f"{vm}.{ln_src}.weight"])
            _set(tower, [ln_dst, "bias"], sd[f"{vm}.{ln_src}.bias"])
        for i in range(num_clip_layers):
            lsrc = f"{vm}.encoder.layers.{i}"
            layer: Params = {}
            for n in ("layer_norm1", "layer_norm2"):
                _set(layer, [n, "scale"], sd[f"{lsrc}.{n}.weight"])
                _set(layer, [n, "bias"], sd[f"{lsrc}.{n}.bias"])
            attn: Params = {}
            for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                _set(
                    attn, [n, "Dense_0", "kernel"],
                    _t_linear(sd[f"{lsrc}.self_attn.{n}.weight"]),
                )
                _set(attn, [n, "Dense_0", "bias"], sd[f"{lsrc}.self_attn.{n}.bias"])
            layer["self_attn"] = attn
            for n in ("fc1", "fc2"):
                _set(
                    layer, [n, "Dense_0", "kernel"],
                    _t_linear(sd[f"{lsrc}.mlp.{n}.weight"]),
                )
                _set(layer, [n, "Dense_0", "bias"], sd[f"{lsrc}.mlp.{n}.bias"])
            tower[f"layer_{i}"] = layer
        out["transformer"] = tower

        mapper: Params = {}
        i = 0
        while f"mapper.resblocks.{i}.ln_1.weight" in sd:
            rsrc = f"mapper.resblocks.{i}"
            blk: Params = {}
            for dst, src in (
                ("c_qkv", f"{rsrc}.attn.c_qkv"),
                ("c_proj", f"{rsrc}.attn.c_proj"),
                ("c_fc", f"{rsrc}.mlp.c_fc"),
                ("mlp_c_proj", f"{rsrc}.mlp.c_proj"),
            ):
                _set(blk, [dst, "Dense_0", "kernel"], _t_linear(sd[f"{src}.weight"]))
                _set(blk, [dst, "Dense_0", "bias"], sd[f"{src}.bias"])
            for n in ("ln_1", "ln_2"):
                _set(blk, [n, "scale"], sd[f"{rsrc}.{n}.weight"])
                _set(blk, [n, "bias"], sd[f"{rsrc}.{n}.bias"])
            mapper[f"resblock_{i}"] = blk
            i += 1
        if mapper:
            out["mapper"] = mapper
        if "final_ln.weight" in sd:  # absent for vision-tower-only imports
            out["final_ln"] = {
                "scale": sd["final_ln.weight"], "bias": sd["final_ln.bias"]
            }

    if "bbox_embedder.bbox_proj.weight" in sd:
        be: Params = {}
        for dst, src in (
            ("bbox_proj", "bbox_embedder.bbox_proj"),
            ("linear_1", "bbox_embedder.second_linear.0"),
            ("linear_2", "bbox_embedder.second_linear.2"),
            ("linear_3", "bbox_embedder.second_linear.4"),
        ):
            _set(be, [dst, "Dense_0", "kernel"], _t_linear(sd[f"{src}.weight"]))
            _set(be, [dst, "Dense_0", "bias"], sd[f"{src}.bias"])
        out["bbox_embedder"] = be
    return out


# ----------------------------------------------------------- full checkpoint
def import_mobi_checkpoint(
    state_dict,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    vae_resolution: int = 512,
    vae_ch_mult: Sequence[int] = (1, 2, 4, 4),
    vae_num_res_blocks: int = 2,
    num_clip_layers: Optional[int] = None,
) -> Params:
    """Full LatentDiffusion Lightning state dict -> mobi_tpu params pytree."""
    sd = to_numpy_state_dict(state_dict)
    params: Params = {}

    unet_sd = _strip_prefix(sd, "model.diffusion_model.")
    if unet_sd:
        params["unet"] = import_unet(
            unet_sd, channel_mult, num_res_blocks, attention_resolutions
        )

    cam_sd = _strip_prefix(sd, "first_stage_model.")
    if cam_sd:
        params["vae_camera"] = import_vae(
            cam_sd, ch_mult=vae_ch_mult, num_res_blocks=vae_num_res_blocks,
            resolution=vae_resolution,
        )

    lid_sd = _strip_prefix(sd, "lidar_stage_model.")
    if lid_sd:
        params["vae_lidar"] = import_vae(
            lid_sd, ch_mult=vae_ch_mult, num_res_blocks=vae_num_res_blocks,
            resolution=vae_resolution, lidar_adapter=True,
        )

    cond_sd = _strip_prefix(sd, "cond_stage_model.")
    if cond_sd:
        params["cond"] = import_cond_stage(cond_sd, num_clip_layers=num_clip_layers)

    if "proj_out.weight" in sd:
        params["proj_out"] = {
            "kernel": _t_linear(sd["proj_out.weight"]),
            "bias": sd["proj_out.bias"],
        }
    if "learnable_vector" in sd:
        params["learnable_vector"] = sd["learnable_vector"]
    if "bbox_uncond_vector" in sd:
        params["bbox_uncond_vector"] = sd["bbox_uncond_vector"]
    return params


def extract_ema_state_dict(state_dict):
    """LitEma buffers -> a 'model.*'-keyed state dict holding EMA values.

    The reference stores EMA shadows as flat buffers named by the tracked
    parameter's name with the dots removed (/root/reference/ldm/modules/
    ema.py:16-21), saved under the 'model_ema.' module prefix. Rebuilds a
    dict keyed like the live 'model.*' entries with the EMA value where one
    is tracked and the live value otherwise (the reference's copy_to only
    overwrites tracked params, ema.py:52-60).

    Returns (state_dict, num_updates) — (None, None) when the checkpoint
    holds no EMA."""
    sd = to_numpy_state_dict(state_dict)
    ema = {k[len("model_ema."):]: v for k, v in sd.items()
           if k.startswith("model_ema.")}
    if not ema:
        return None, None
    num_updates = ema.pop("num_updates", None)
    ema.pop("decay", None)
    out = {}
    for k, v in sd.items():
        if k.startswith("model.") and not k.startswith("model_ema."):
            out[k] = ema.get(k[len("model."):].replace(".", ""), v)
    return out, num_updates


def merge_imported(base: Params, imported: Params) -> Params:
    """Overlay imported values on an init tree (strict=False semantics of the
    reference's partial checkpoint load, ddpm.py:196-212), with shape checks."""
    import jax

    def merge(dst, src, path=""):
        if isinstance(src, dict):
            out = dict(dst) if isinstance(dst, dict) else {}
            for k, v in src.items():
                out[k] = merge(dst.get(k) if isinstance(dst, dict) else None, v,
                               f"{path}/{k}")
            if isinstance(dst, dict):
                for k in dst:
                    if k not in out:
                        out[k] = dst[k]
            return out
        if dst is not None and hasattr(dst, "shape"):
            if tuple(dst.shape) != tuple(np.shape(src)):
                raise ValueError(
                    f"shape mismatch at {path}: have {dst.shape}, ckpt {np.shape(src)}"
                )
            return np.asarray(src, dtype=np.asarray(dst).dtype)
        return np.asarray(src)

    return merge(base, imported)


def import_lidar_stage_from_config(cfg: Dict, params: Params) -> Params:
    """Reference-parity auto-load of ``lidar_stage_config.params.ckpt_path``.

    The reference LatentDiffusion loads the pretrained range autoencoder at
    model construction (ddpm.py:546-562 -> AutoencoderKL ckpt_path ->
    init_from_ckpt), BEFORE any ``--pretrained_model`` overlay. When the
    config names a ckpt_path and the file exists, the lidar VAE leaves are
    overlaid onto ``params`` and the result returned. The reference crashes
    on a missing file; shipped configs name published artifacts that are not
    present on every machine, so a missing file prints a loud warning and
    returns ``params`` unchanged instead.
    """
    import os

    from mobi_tpu.checkpoint import load_torch_checkpoint, restore_partial

    mp = cfg.get("model", {}).get("params", {})
    lsc = (mp.get("lidar_stage_config") or {}).get("params", {})
    path = lsc.get("ckpt_path")
    if not path or not mp.get("use_lidar", False):
        return params
    if not os.path.exists(path):
        print(
            f"WARNING: lidar_stage_config.params.ckpt_path={path!r} does not "
            "exist — the lidar VAE stays randomly initialized (the reference "
            "would refuse to start). Provide the range autoencoder artifact "
            "or remove ckpt_path."
        )
        return params

    sd = to_numpy_state_dict(load_torch_checkpoint(path))
    # accept a bare AutoencoderKL ckpt or a full LatentDiffusion one
    if not any(k.startswith("encoder.") for k in sd):
        sd = _strip_prefix(sd, "lidar_stage_model.")
    dd = lsc.get("ddconfig", {})
    imported = import_vae(
        sd,
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        resolution=dd.get("resolution", cfg.get("range_height", 512)),
        lidar_adapter=dd.get("lidar_adapter", True),
    )
    print(f"initialized lidar VAE from {path}")
    return restore_partial(params, {"vae_lidar": imported})

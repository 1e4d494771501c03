"""BEVFusion detector checkpoint exporter — the inverse of
`mobi_tpu.import_bevfusion`.

Maps a `BEVFusionDetector` flax param tree onto the reference detector's
torch state-dict layout (the model assembled by
/root/reference/bevfusion/mmdet3d/models/fusion_models/bevfusion.py:25-77),
so detectors trained with mobi_tpu can be evaluated by reference tooling,
and so tests can fabricate complete reference-format checkpoints to drive
the import + inference path end-to-end.

Every function here mirrors an `import_bevfusion` counterpart; the
round-trip `import_bevfusion(export_bevfusion(p)) == p` is asserted in
tests/test_export_bevfusion.py, which pins the permutation inverses
(swin patch-merge unfold order, fuser dense()-flattening order, deconv
spatial mirror).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]
SD = Dict[str, np.ndarray]


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _conv_inv(v) -> np.ndarray:
    """flax (kH, kW, I, O) -> torch Conv2d (O, I, kH, kW)."""
    return np.ascontiguousarray(_np(v).transpose(3, 2, 0, 1))


def _deconv_inv(v) -> np.ndarray:
    """flax ConvTranspose (kH, kW, I, O) -> torch ConvTranspose2d
    (I, O, kH, kW) — undo the spatial mirror of import's `_deconv`."""
    return np.ascontiguousarray(_np(v).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])


def _lin_inv(v, conv1d: bool = False) -> np.ndarray:
    """Dense kernel (I, O) -> torch Linear (O, I) / Conv1d (O, I, 1)."""
    a = _np(v).T
    return a[..., None] if conv1d else np.ascontiguousarray(a)


def _get(tree: Params, *path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _bn_out(sd: SD, dst: str, tree: Params, path, flat_prefix="bn"):
    node = _get(tree, *path) if path else tree
    sd[f"{dst}.weight"] = _np(node[f"{flat_prefix}_scale"])
    sd[f"{dst}.bias"] = _np(node[f"{flat_prefix}_bias"])
    sd[f"{dst}.running_mean"] = _np(node[f"{flat_prefix}_mean"])
    sd[f"{dst}.running_var"] = _np(node[f"{flat_prefix}_var"])
    sd[f"{dst}.num_batches_tracked"] = np.asarray(0, np.int64)


def _ln_out(sd: SD, dst: str, node: Params):
    sd[f"{dst}.weight"] = _np(node["scale"])
    sd[f"{dst}.bias"] = _np(node["bias"])


# --------------------------------------------------------------------- Swin
def export_swin(p: Params, prefix: str = "", window: int = 7,
                depths=(2, 2, 6, 2), out_indices=(1, 2, 3)) -> SD:
    """SwinTransformerTPU params -> mmdet SwinTransformer state dict.

    The relative-position bias is emitted under mobi_tpu's canonical
    displacement indexing together with the matching
    `relative_position_index` buffer — `import_swin` gathers through the
    checkpoint's own buffer, so any self-consistent pair round-trips.
    """
    from mobi_tpu.models.swin import _rel_pos_index

    sd: SD = {}
    sd[f"{prefix}patch_embed.projection.weight"] = _conv_inv(
        p["patch_embed"]["kernel"])
    sd[f"{prefix}patch_embed.projection.bias"] = _np(p["patch_embed"]["bias"])
    _ln_out(sd, f"{prefix}patch_embed.norm", p["patch_norm"])

    canon_idx = _rel_pos_index(window).astype(np.int64)
    dim0 = p["patch_embed"]["kernel"].shape[-1]
    for s, depth in enumerate(depths):
        for b in range(depth):
            blk = p[f"stage{s}_block{b}"]
            dst = f"{prefix}stages.{s}.blocks.{b}"
            _ln_out(sd, f"{dst}.norm1", blk["norm1"])
            _ln_out(sd, f"{dst}.norm2", blk["norm2"])
            attn = blk["attn"]
            sd[f"{dst}.attn.w_msa.qkv.weight"] = _lin_inv(attn["qkv"]["kernel"])
            sd[f"{dst}.attn.w_msa.qkv.bias"] = _np(attn["qkv"]["bias"])
            sd[f"{dst}.attn.w_msa.proj.weight"] = _lin_inv(attn["proj"]["kernel"])
            sd[f"{dst}.attn.w_msa.proj.bias"] = _np(attn["proj"]["bias"])
            sd[f"{dst}.attn.w_msa.relative_position_bias_table"] = _np(
                attn["rel_bias"])
            sd[f"{dst}.attn.w_msa.relative_position_index"] = canon_idx
            sd[f"{dst}.ffn.layers.0.0.weight"] = _lin_inv(blk["fc1"]["kernel"])
            sd[f"{dst}.ffn.layers.0.0.bias"] = _np(blk["fc1"]["bias"])
            sd[f"{dst}.ffn.layers.1.weight"] = _lin_inv(blk["fc2"]["kernel"])
            sd[f"{dst}.ffn.layers.1.bias"] = _np(blk["fc2"]["bias"])
        if f"merge{s}" in p:
            c = dim0 * (2 ** s)
            unfold_of_block = (0, 2, 1, 3)
            perm = np.concatenate(
                [np.arange(c) * 4 + unfold_of_block[blk_i] for blk_i in range(4)]
            )
            inv = np.argsort(perm)
            red = _np(p[f"merge{s}"]["reduction"]["kernel"])[inv]
            sd[f"{prefix}stages.{s}.downsample.reduction.weight"] = (
                np.ascontiguousarray(red.T))
            sd[f"{prefix}stages.{s}.downsample.norm.weight"] = _np(
                p[f"merge{s}"]["norm"]["scale"])[inv]
            sd[f"{prefix}stages.{s}.downsample.norm.bias"] = _np(
                p[f"merge{s}"]["norm"]["bias"])[inv]
    for s in out_indices:
        _ln_out(sd, f"{prefix}norm{s}", p[f"out_norm{s}"])
    return sd


# ---------------------------------------------------------------- camera FPN
def export_lss_fpn(p: Params, prefix: str, num_levels: int = 2) -> SD:
    sd: SD = {}
    for i in range(num_levels):
        for ours, dst in ((f"lateral{i}", f"lateral_convs.{i}"),
                          (f"fpn{i}", f"fpn_convs.{i}")):
            sd[f"{prefix}{dst}.conv.weight"] = _conv_inv(
                p[ours]["conv"]["kernel"])
            _bn_out(sd, f"{prefix}{dst}.bn", p, [ours])
    return sd


# ------------------------------------------------------------- DepthLSS
def export_depth_lss(p: Params, prefix: str) -> SD:
    sd: SD = {}
    for ours, conv_i, bn_i in (("dt_conv0", 0, 1), ("dt_conv1", 3, 4),
                               ("dt_conv2", 6, 7)):
        sd[f"{prefix}dtransform.{conv_i}.weight"] = _conv_inv(p[ours]["kernel"])
        sd[f"{prefix}dtransform.{conv_i}.bias"] = _np(p[ours]["bias"])
        _bn_out(sd, f"{prefix}dtransform.{bn_i}", p, [],
                flat_prefix=ours.replace("conv", "bn"))
    for ours, conv_i in (("dn_conv0", 0), ("dn_conv1", 3), ("dn_out", 6)):
        sd[f"{prefix}depthnet.{conv_i}.weight"] = _conv_inv(p[ours]["kernel"])
        sd[f"{prefix}depthnet.{conv_i}.bias"] = _np(p[ours]["bias"])
    _bn_out(sd, f"{prefix}depthnet.1", p, [], flat_prefix="dn_bn0")
    _bn_out(sd, f"{prefix}depthnet.4", p, [], flat_prefix="dn_bn1")
    if "ds_conv0" in p:
        for ours, conv_i, bn_i in (("ds_conv0", 0, 1), ("ds_conv1", 3, 4),
                                   ("ds_conv2", 6, 7)):
            sd[f"{prefix}downsample.{conv_i}.weight"] = _conv_inv(
                p[ours]["conv"]["kernel"])
            _bn_out(sd, f"{prefix}downsample.{bn_i}", p, [ours])
    return sd


# --------------------------------------------------------- sparse encoder
def _spconv_w_inv(v, kernel_size) -> np.ndarray:
    """ours [K, Cin, Cout] -> spconv weight (*kernel_size, in, out)."""
    a = _np(v)
    return a.reshape(tuple(kernel_size) + a.shape[-2:])


def export_sparse_encoder(p: Params, prefix: str) -> SD:
    """Inverse of import_sparse_encoder: basicblock plan, kernels (3,3,3)
    everywhere except conv_out's (3,1,1) (sparse_encoder.py:121-133)."""
    sd: SD = {}

    def convmodule(ours_path, dst, kernel_size=(3, 3, 3)):
        node = _get(p, *ours_path)
        sd[f"{dst}.0.weight"] = _spconv_w_inv(node["kernel"], kernel_size)
        _bn_out(sd, f"{dst}.1", p, ours_path)

    def basicblock(ours_path, dst):
        node = _get(p, *ours_path)
        for ours, conv, bn in (("conv1", "conv1", "bn1"),
                               ("conv2", "conv2", "bn2")):
            sd[f"{dst}.{conv}.weight"] = _spconv_w_inv(
                node[ours]["kernel"], (3, 3, 3))
            _bn_out(sd, f"{dst}.{bn}", p, ours_path + [ours])

    convmodule(["conv_input"], f"{prefix}conv_input")
    stage_layouts = ((2, True), (2, True), (2, True), (2, False))
    for i, (n_blocks, has_down) in enumerate(stage_layouts):
        dst_stage = f"{prefix}encoder_layers.encoder_layer{i + 1}"
        for j in range(n_blocks):
            basicblock([f"stage{i}_block{j}"], f"{dst_stage}.{j}")
        if has_down:
            convmodule([f"stage{i}_down"], f"{dst_stage}.{n_blocks}")
    convmodule(["conv_out"], f"{prefix}conv_out", kernel_size=(3, 1, 1))
    return sd


# ------------------------------------------------------------ dense blocks
def export_second(p: Params, prefix: str, layer_nums=(5, 5)) -> SD:
    sd: SD = {}
    for i, n in enumerate(layer_nums):
        for j in range(n + 1):
            conv_i = 3 * j
            node = p[f"stage{i}_conv{j}"]
            sd[f"{prefix}blocks.{i}.{conv_i}.weight"] = _conv_inv(
                node["conv"]["kernel"])
            _bn_out(sd, f"{prefix}blocks.{i}.{conv_i + 1}", p,
                    [f"stage{i}_conv{j}"])
    return sd


def export_second_fpn(p: Params, prefix: str, upsample_strides=(1, 2)) -> SD:
    sd: SD = {}
    for i, s in enumerate(upsample_strides):
        if s > 1:
            sd[f"{prefix}deblocks.{i}.0.weight"] = _deconv_inv(
                p[f"deblock{i}_up"]["kernel"])
        else:
            sd[f"{prefix}deblocks.{i}.0.weight"] = _conv_inv(
                p[f"deblock{i}_conv"]["kernel"])
        _bn_out(sd, f"{prefix}deblocks.{i}.1", p, [],
                flat_prefix=f"deblock{i}_bn")
    return sd


def export_fuser(p: Params, prefix: str, camera_channels: int = 80,
                 lidar_c: int = 128, lidar_d: int = 2) -> SD:
    """Inverse of import_fuser: permute our Z-major lidar input-channel
    block back to the reference's C-major D-minor dense() flattening.
    With camera_channels=0 the whole input is the lidar block (the layout
    a lidar-only mobi_tpu detector exports)."""
    w = _np(p["fuse"]["conv"]["kernel"])  # [kH, kW, In, Out]
    n_lidar = lidar_c * lidar_d
    cam, lid = w[..., :camera_channels, :], w[..., camera_channels:, :]
    assert lid.shape[-2] == n_lidar, (lid.shape, n_lidar)
    z = np.arange(n_lidar) // lidar_c
    c = np.arange(n_lidar) % lidar_c
    perm = c * lidar_d + z
    inv = np.argsort(perm)
    w = np.concatenate([cam, lid[..., inv, :]], axis=-2)
    sd: SD = {f"{prefix}0.weight": _conv_inv(w)}
    _bn_out(sd, f"{prefix}1", p, ["fuse"])
    return sd


# ----------------------------------------------------------------- head
def export_transfusion_head(p: Params, prefix: str,
                            num_decoder_layers: int = 1) -> SD:
    sd: SD = {}
    sd[f"{prefix}shared_conv.weight"] = _conv_inv(p["shared_conv"]["kernel"])
    sd[f"{prefix}shared_conv.bias"] = _np(p["shared_conv"]["bias"])

    sd[f"{prefix}heatmap_head.0.conv.weight"] = _conv_inv(
        p["heatmap_conv"]["conv"]["kernel"])
    _bn_out(sd, f"{prefix}heatmap_head.0.bn", p, ["heatmap_conv"])
    sd[f"{prefix}heatmap_head.1.weight"] = _conv_inv(
        p["heatmap_out"]["kernel"])
    sd[f"{prefix}heatmap_head.1.bias"] = _np(p["heatmap_out"]["bias"])

    sd[f"{prefix}class_encoding.weight"] = _lin_inv(
        p["class_encoding"]["kernel"], conv1d=True)
    sd[f"{prefix}class_encoding.bias"] = _np(p["class_encoding"]["bias"])

    for i in range(num_decoder_layers):
        dec = p[f"decoder{i}"]
        dst = f"{prefix}decoder.{i}"
        for ours, attn in (("self_attn", "self_attn"),
                           ("cross_attn", "multihead_attn")):
            node = dec[ours]
            sd[f"{dst}.{attn}.in_proj_weight"] = np.concatenate(
                [_np(node[n]["kernel"]).T for n in ("q", "k", "v")], axis=0)
            sd[f"{dst}.{attn}.in_proj_bias"] = np.concatenate(
                [_np(node[n]["bias"]) for n in ("q", "k", "v")], axis=0)
            sd[f"{dst}.{attn}.out_proj.weight"] = _lin_inv(node["out"]["kernel"])
            sd[f"{dst}.{attn}.out_proj.bias"] = _np(node["out"]["bias"])
        for n in ("norm1", "norm2", "norm3"):
            _ln_out(sd, f"{dst}.{n}", dec[n])
        for n in ("linear1", "linear2"):
            sd[f"{dst}.{n}.weight"] = _lin_inv(dec[n]["kernel"])
            sd[f"{dst}.{n}.bias"] = _np(dec[n]["bias"])
        for pe in ("self_posembed", "cross_posembed"):
            head = f"{dst}.{pe}.position_embedding_head"
            sd[f"{head}.0.weight"] = _lin_inv(dec[pe]["fc1"]["kernel"],
                                              conv1d=True)
            sd[f"{head}.0.bias"] = _np(dec[pe]["fc1"]["bias"])
            _bn_out(sd, f"{head}.1", dec, [pe])
            sd[f"{head}.3.weight"] = _lin_inv(dec[pe]["fc2"]["kernel"],
                                              conv1d=True)
            sd[f"{head}.3.bias"] = _np(dec[pe]["fc2"]["bias"])

        pred = p[f"pred{i}"]
        dst_p = f"{prefix}prediction_heads.{i}"
        for name in ("center", "height", "dim", "rot", "vel", "heatmap"):
            sd[f"{dst_p}.{name}.0.conv.weight"] = _lin_inv(
                pred[f"{name}_fc"]["kernel"], conv1d=True)
            sd[f"{dst_p}.{name}.0.conv.bias"] = _np(pred[f"{name}_fc"]["bias"])
            _bn_out(sd, f"{dst_p}.{name}.0.bn", pred, [],
                    flat_prefix=f"{name}_bn")
            sd[f"{dst_p}.{name}.1.weight"] = _lin_inv(
                pred[f"{name}_out"]["kernel"], conv1d=True)
            sd[f"{dst_p}.{name}.1.bias"] = _np(pred[f"{name}_out"]["bias"])
    return sd


def export_bevfusion(params: Params, use_camera: bool = True) -> SD:
    """BEVFusionDetector params -> full reference-layout state dict.

    With use_camera=False the fuser is exported with camera_channels=0:
    the reference's lidar-only assembly has no fuser module at all
    (fusion_models/bevfusion.py skips fusion for a single modality), so a
    lidar-only export is readable back by `import_bevfusion` but is NOT a
    drop-in for the reference's lidar-only config.
    """
    sd: SD = {}
    if use_camera:
        sd.update(export_swin(params["camera_backbone"],
                              "encoders.camera.backbone."))
        sd.update(export_lss_fpn(params["camera_neck"],
                                 "encoders.camera.neck."))
        sd.update(export_depth_lss(params["vtransform"],
                                   "encoders.camera.vtransform."))
    sd.update(export_sparse_encoder(params["lidar_encoder"],
                                    "encoders.lidar.backbone."))
    sd.update(export_fuser(params["fuser"], "fuser.",
                           camera_channels=80 if use_camera else 0))
    sd.update(export_second(params["backbone"], "decoder.backbone."))
    sd.update(export_second_fpn(params["neck"], "decoder.neck."))
    sd.update(export_transfusion_head(params["head"], "heads.object."))
    return sd


def save_reference_checkpoint(params: Params, path: str,
                              use_camera: bool = True) -> str:
    """Write a torch-loadable .pth in the reference layout (the format
    `mobi_tpu.checkpoint.load_torch_checkpoint` and the reference's
    tools/test.py both consume)."""
    import torch

    sd = export_bevfusion(params, use_camera=use_camera)
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}},
        path,
    )
    return path

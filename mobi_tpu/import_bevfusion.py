"""BEVFusion detector checkpoint importer.

Maps the reference detector's torch state dict (`bevfusion-det.pth`, the
model assembled by
/root/reference/bevfusion/mmdet3d/models/fusion_models/bevfusion.py:25-77)
onto `mobi_tpu.models.bevfusion.BEVFusionDetector`'s flax param tree.

Source-layout references (all under /root/reference/bevfusion/mmdet3d):
  * encoders.camera.backbone.*   mmdet SwinTransformer (swin-T; external to
    the repo — layout pinned by tests/test_bevfusion_golden.py's replica)
  * encoders.camera.neck.*       models/necks/generalized_lss.py:13-110
  * encoders.camera.vtransform.* models/vtransforms/depth_lss.py:15-101
  * encoders.lidar.backbone.*    models/backbones/sparse_encoder.py:11-218
    (spconv weights are (*kernel_size, in, out), ops/spconv/conv.py:100)
  * fuser.*                      models/fusers/conv.py
  * decoder.backbone.*           models/backbones/second.py:25-95
  * decoder.neck.*               models/necks/second.py:25-110
  * heads.object.*               models/heads/bbox/transfusion.py:96-170 +
                                 models/utils/transformer.py (decoder/FFN)

Conventions:
  * torch Conv2d (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
  * torch ConvTranspose2d (I, O, kH, kW) -> flax (kH, kW, I, O)
  * torch Linear / Conv1d(k=1) (O, I[, 1]) -> flax Dense kernel (I, O)
  * BN -> bn_scale / bn_bias / bn_mean / bn_var leaves
  * the sparse-encoder dense BEV uses z-major channel flattening
    ([X, Y, Z*C], bevfusion.py densify) while the reference's .dense() view
    is C-major ([N, C*D, H, W], sparse_encoder.py:128-131) — the fuser
    conv's lidar input-channel block is permuted here to compensate.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _conv(v) -> np.ndarray:
    """torch Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return _np(v).transpose(2, 3, 1, 0)


def _deconv(v) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kH, kW) -> flax ConvTranspose
    (kH, kW, I, O). flax's lax.conv_transpose treats the kernel as a
    forward-conv kernel, so the spatial taps must be mirrored to match
    torch's deconv semantics (verified empirically in
    test_second_fpn_parity)."""
    return np.ascontiguousarray(_np(v)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _lin(v) -> np.ndarray:
    """torch Linear (O, I) / Conv1d (O, I, 1) -> Dense kernel (I, O)."""
    a = _np(v)
    if a.ndim == 3:
        a = a[..., 0]
    return a.T


def _set(tree: Params, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _bn_leaves(tree: Params, path_prefix, sd, src, flat_prefix="bn"):
    """BN params at module level (bevfusion._bn naming)."""
    _set(tree, path_prefix + [f"{flat_prefix}_scale"], _np(sd[f"{src}.weight"]))
    _set(tree, path_prefix + [f"{flat_prefix}_bias"], _np(sd[f"{src}.bias"]))
    _set(tree, path_prefix + [f"{flat_prefix}_mean"], _np(sd[f"{src}.running_mean"]))
    _set(tree, path_prefix + [f"{flat_prefix}_var"], _np(sd[f"{src}.running_var"]))


def _ln(tree: Params, path_prefix, sd, src):
    _set(tree, path_prefix + ["scale"], _np(sd[f"{src}.weight"]))
    _set(tree, path_prefix + ["bias"], _np(sd[f"{src}.bias"]))


# --------------------------------------------------------------------- Swin
def _swin_rel_bias(sd: Dict, prefix: str, window: int) -> np.ndarray:
    """Re-permute the trained relative-position-bias table from the
    checkpoint's own `relative_position_index` buffer into the canonical
    displacement indexing `mobi_tpu.models.swin._rel_pos_index` uses.

    mmdet's WindowMSA builds its index buffer with a double-step-seq + flip
    construction; rather than trusting it equals the canonical one, gather
    the full [n, n] bias with the checkpoint's buffer and solve for the
    table under our indexing (asserting displacement consistency)."""
    from mobi_tpu.models.swin import _rel_pos_index

    table = _np(sd[f"{prefix}.relative_position_bias_table"])  # [(2w-1)^2, H]
    ref_idx = np.asarray(sd[f"{prefix}.relative_position_index"]).astype(np.int64)
    ours_idx = _rel_pos_index(window).astype(np.int64)
    out = np.zeros_like(table)
    seen = np.full(table.shape[0], -1, np.int64)
    for i in range(ref_idx.shape[0]):
        for j in range(ref_idx.shape[1]):
            o, r = ours_idx[i, j], ref_idx[i, j]
            if seen[o] == -1:
                seen[o] = r
                out[o] = table[r]
            elif seen[o] != r:
                raise ValueError(
                    "relative_position_index is not displacement-consistent"
                )
    return out


def import_swin(sd: Dict, prefix: str = "", window: int = 7,
                depths=(2, 2, 6, 2), out_indices=(1, 2, 3)) -> Params:
    """mmdet SwinTransformer state dict -> SwinTransformerTPU params.

    mmdet's PatchMerging samples the 2x2 neighborhood with nn.Unfold
    (channel-major (c, kh, kw) flattening) while ours concatenates
    (h0,w0),(h1,w0),(h0,w1),(h1,w1) blocks — the merge norm/reduction
    input dims are permuted accordingly."""
    p: Params = {}
    _set(p, ["patch_embed", "kernel"], _conv(sd[f"{prefix}patch_embed.projection.weight"]))
    _set(p, ["patch_embed", "bias"], _np(sd[f"{prefix}patch_embed.projection.bias"]))
    _ln(p, ["patch_norm"], sd, f"{prefix}patch_embed.norm")

    dim0 = sd[f"{prefix}patch_embed.projection.weight"].shape[0]
    for s, depth in enumerate(depths):
        for b in range(depth):
            src = f"{prefix}stages.{s}.blocks.{b}"
            blk = [f"stage{s}_block{b}"]
            _ln(p, blk + ["norm1"], sd, f"{src}.norm1")
            _ln(p, blk + ["norm2"], sd, f"{src}.norm2")
            attn = blk + ["attn"]
            _set(p, attn + ["qkv", "kernel"], _lin(sd[f"{src}.attn.w_msa.qkv.weight"]))
            _set(p, attn + ["qkv", "bias"], _np(sd[f"{src}.attn.w_msa.qkv.bias"]))
            _set(p, attn + ["proj", "kernel"], _lin(sd[f"{src}.attn.w_msa.proj.weight"]))
            _set(p, attn + ["proj", "bias"], _np(sd[f"{src}.attn.w_msa.proj.bias"]))
            _set(p, attn + ["rel_bias"],
                 _swin_rel_bias(sd, f"{src}.attn.w_msa", window))
            _set(p, blk + ["fc1", "kernel"], _lin(sd[f"{src}.ffn.layers.0.0.weight"]))
            _set(p, blk + ["fc1", "bias"], _np(sd[f"{src}.ffn.layers.0.0.bias"]))
            _set(p, blk + ["fc2", "kernel"], _lin(sd[f"{src}.ffn.layers.1.weight"]))
            _set(p, blk + ["fc2", "bias"], _np(sd[f"{src}.ffn.layers.1.bias"]))
        if f"{prefix}stages.{s}.downsample.reduction.weight" in sd:
            c = dim0 * (2 ** s)
            # unfold channel index c*4 + (kh*2 + kw) -> our block*(C) + c with
            # blocks ordered (0,0), (1,0), (0,1), (1,1)
            unfold_of_block = (0, 2, 1, 3)
            perm = np.concatenate(
                [np.arange(c) * 4 + unfold_of_block[blk_i] for blk_i in range(4)]
            )
            red = _lin(sd[f"{prefix}stages.{s}.downsample.reduction.weight"])
            _set(p, [f"merge{s}", "reduction", "kernel"], red[perm])
            nw = _np(sd[f"{prefix}stages.{s}.downsample.norm.weight"])[perm]
            nb = _np(sd[f"{prefix}stages.{s}.downsample.norm.bias"])[perm]
            _set(p, [f"merge{s}", "norm", "scale"], nw)
            _set(p, [f"merge{s}", "norm", "bias"], nb)
    for s in out_indices:
        _ln(p, [f"out_norm{s}"], sd, f"{prefix}norm{s}")
    return p


# ---------------------------------------------------------------- camera FPN
def import_lss_fpn(sd: Dict, prefix: str, num_levels: int = 2) -> Params:
    p: Params = {}
    for i in range(num_levels):
        for ours, src in ((f"lateral{i}", f"lateral_convs.{i}"),
                          (f"fpn{i}", f"fpn_convs.{i}")):
            _set(p, [ours, "conv", "kernel"], _conv(sd[f"{prefix}{src}.conv.weight"]))
            _bn_leaves(p, [ours], sd, f"{prefix}{src}.bn")
    return p


# ------------------------------------------------------------- DepthLSS
def import_depth_lss(sd: Dict, prefix: str) -> Params:
    p: Params = {}
    # dtransform: Sequential convs at 0,3,6 / bns at 1,4,7
    for ours, conv_i, bn_i in (("dt_conv0", 0, 1), ("dt_conv1", 3, 4),
                               ("dt_conv2", 6, 7)):
        _set(p, [ours, "kernel"], _conv(sd[f"{prefix}dtransform.{conv_i}.weight"]))
        _set(p, [ours, "bias"], _np(sd[f"{prefix}dtransform.{conv_i}.bias"]))
        _bn_leaves(p, [], sd, f"{prefix}dtransform.{bn_i}",
                   flat_prefix=ours.replace("conv", "bn"))
    # depthnet: convs 0,3,6 / bns 1,4
    for ours, conv_i in (("dn_conv0", 0), ("dn_conv1", 3), ("dn_out", 6)):
        _set(p, [ours, "kernel"], _conv(sd[f"{prefix}depthnet.{conv_i}.weight"]))
        _set(p, [ours, "bias"], _np(sd[f"{prefix}depthnet.{conv_i}.bias"]))
    _bn_leaves(p, [], sd, f"{prefix}depthnet.1", flat_prefix="dn_bn0")
    _bn_leaves(p, [], sd, f"{prefix}depthnet.4", flat_prefix="dn_bn1")
    # downsample: convs 0,3,6 (bias=False) / bns 1,4,7
    if f"{prefix}downsample.0.weight" in sd:
        for ours, conv_i, bn_i in (("ds_conv0", 0, 1), ("ds_conv1", 3, 4),
                                   ("ds_conv2", 6, 7)):
            _set(p, [ours, "conv", "kernel"],
                 _conv(sd[f"{prefix}downsample.{conv_i}.weight"]))
            _bn_leaves(p, [ours], sd, f"{prefix}downsample.{bn_i}")
    return p


# --------------------------------------------------------- sparse encoder
def _spconv_w(v) -> np.ndarray:
    """spconv weight (*kernel_size, in, out) -> ours [K, Cin, Cout]
    (row-major kernel enumeration on both sides)."""
    a = _np(v)
    return a.reshape(-1, a.shape[-2], a.shape[-1])


def import_sparse_encoder(sd: Dict, prefix: str) -> Params:
    """basicblock plan (sparse_encoder.py:134-218 + det config
    encoder_channels ((16,16,32),(32,32,64),(64,64,128),(128,128)))."""
    p: Params = {}

    def convmodule(ours_path, src):
        _set(p, ours_path + ["kernel"], _spconv_w(sd[f"{src}.0.weight"]))
        _bn_leaves(p, ours_path, sd, f"{src}.1")

    def basicblock(ours_path, src):
        for ours, conv, bn in (("conv1", "conv1", "bn1"), ("conv2", "conv2", "bn2")):
            _set(p, ours_path + [ours, "kernel"], _spconv_w(sd[f"{src}.{conv}.weight"]))
            _bn_leaves(p, ours_path + [ours], sd, f"{src}.{bn}")

    convmodule(["conv_input"], f"{prefix}conv_input")
    stage_layouts = ((2, True), (2, True), (2, True), (2, False))
    for i, (n_blocks, has_down) in enumerate(stage_layouts):
        src_stage = f"{prefix}encoder_layers.encoder_layer{i + 1}"
        for j in range(n_blocks):
            basicblock([f"stage{i}_block{j}"], f"{src_stage}.{j}")
        if has_down:
            convmodule([f"stage{i}_down"], f"{src_stage}.{n_blocks}")
    convmodule(["conv_out"], f"{prefix}conv_out")
    return p


# ------------------------------------------------------------ dense blocks
def import_second(sd: Dict, prefix: str, layer_nums=(5, 5)) -> Params:
    p: Params = {}
    for i, n in enumerate(layer_nums):
        for j in range(n + 1):
            conv_i = 3 * j
            ours = [f"stage{i}_conv{j}"]
            _set(p, ours + ["conv", "kernel"],
                 _conv(sd[f"{prefix}blocks.{i}.{conv_i}.weight"]))
            _bn_leaves(p, ours, sd, f"{prefix}blocks.{i}.{conv_i + 1}")
    return p


def import_second_fpn(sd: Dict, prefix: str, upsample_strides=(1, 2)) -> Params:
    p: Params = {}
    for i, s in enumerate(upsample_strides):
        w = sd[f"{prefix}deblocks.{i}.0.weight"]
        if s > 1:
            _set(p, [f"deblock{i}_up", "kernel"], _deconv(w))
        else:
            _set(p, [f"deblock{i}_conv", "kernel"], _conv(w))
        _bn_leaves(p, [], sd, f"{prefix}deblocks.{i}.1",
                   flat_prefix=f"deblock{i}_bn")
    return p


def import_fuser(sd: Dict, prefix: str, camera_channels: int = 80,
                 lidar_c: int = 128, lidar_d: int = 2) -> Params:
    """ConvFuser (fusers/conv.py nn.Sequential: 0 conv, 1 bn). The lidar
    input-channel block is permuted from the reference's C-major D-minor
    dense() flattening to our Z-major layout (see module docstring)."""
    w = _conv(sd[f"{prefix}0.weight"])  # [kH, kW, In, Out]
    n_lidar = lidar_c * lidar_d
    cam, lid = w[..., :camera_channels, :], w[..., camera_channels:, :]
    assert lid.shape[-2] == n_lidar, (lid.shape, n_lidar)
    # ours index z*C + c  <-  torch index c*D + z
    z = np.arange(n_lidar) // lidar_c
    c = np.arange(n_lidar) % lidar_c
    perm = c * lidar_d + z
    w = np.concatenate([cam, lid[..., perm, :]], axis=-2)
    p: Params = {"fuse": {"conv": {"kernel": w}}}
    _bn_leaves(p, ["fuse"], sd, f"{prefix}1")
    return p


# ----------------------------------------------------------------- head
def import_transfusion_head(sd: Dict, prefix: str,
                            num_decoder_layers: int = 1) -> Params:
    p: Params = {}
    _set(p, ["shared_conv", "kernel"], _conv(sd[f"{prefix}shared_conv.weight"]))
    _set(p, ["shared_conv", "bias"], _np(sd[f"{prefix}shared_conv.bias"]))

    _set(p, ["heatmap_conv", "conv", "kernel"],
         _conv(sd[f"{prefix}heatmap_head.0.conv.weight"]))
    _bn_leaves(p, ["heatmap_conv"], sd, f"{prefix}heatmap_head.0.bn")
    _set(p, ["heatmap_out", "kernel"], _conv(sd[f"{prefix}heatmap_head.1.weight"]))
    _set(p, ["heatmap_out", "bias"], _np(sd[f"{prefix}heatmap_head.1.bias"]))

    _set(p, ["class_encoding", "kernel"], _lin(sd[f"{prefix}class_encoding.weight"]))
    _set(p, ["class_encoding", "bias"], _np(sd[f"{prefix}class_encoding.bias"]))

    for i in range(num_decoder_layers):
        dec = [f"decoder{i}"]
        src = f"{prefix}decoder.{i}"
        for ours, attn in (("self_attn", "self_attn"),
                           ("cross_attn", "multihead_attn")):
            w = _np(sd[f"{src}.{attn}.in_proj_weight"])  # [3C, C]
            b = _np(sd[f"{src}.{attn}.in_proj_bias"])
            cdim = w.shape[1]
            for k, name in enumerate(("q", "k", "v")):
                _set(p, dec + [ours, name, "kernel"],
                     w[k * cdim:(k + 1) * cdim].T)
                _set(p, dec + [ours, name, "bias"], b[k * cdim:(k + 1) * cdim])
            _set(p, dec + [ours, "out", "kernel"],
                 _lin(sd[f"{src}.{attn}.out_proj.weight"]))
            _set(p, dec + [ours, "out", "bias"],
                 _np(sd[f"{src}.{attn}.out_proj.bias"]))
        for n in ("norm1", "norm2", "norm3"):
            _ln(p, dec + [n], sd, f"{src}.{n}")
        for n in ("linear1", "linear2"):
            _set(p, dec + [n, "kernel"], _lin(sd[f"{src}.{n}.weight"]))
            _set(p, dec + [n, "bias"], _np(sd[f"{src}.{n}.bias"]))
        for pe in ("self_posembed", "cross_posembed"):
            head = f"{src}.{pe}.position_embedding_head"
            _set(p, dec + [pe, "fc1", "kernel"], _lin(sd[f"{head}.0.weight"]))
            _set(p, dec + [pe, "fc1", "bias"], _np(sd[f"{head}.0.bias"]))
            _bn_leaves(p, dec + [pe], sd, f"{head}.1")
            _set(p, dec + [pe, "fc2", "kernel"], _lin(sd[f"{head}.3.weight"]))
            _set(p, dec + [pe, "fc2", "bias"], _np(sd[f"{head}.3.bias"]))

        pred = [f"pred{i}"]
        src_p = f"{prefix}prediction_heads.{i}"
        for name in ("center", "height", "dim", "rot", "vel", "heatmap"):
            _set(p, pred + [f"{name}_fc", "kernel"],
                 _lin(sd[f"{src_p}.{name}.0.conv.weight"]))
            if f"{src_p}.{name}.0.conv.bias" in sd:
                _set(p, pred + [f"{name}_fc", "bias"],
                     _np(sd[f"{src_p}.{name}.0.conv.bias"]))
            else:
                bn_w = sd[f"{src_p}.{name}.0.bn.weight"]
                _set(p, pred + [f"{name}_fc", "bias"],
                     np.zeros(len(bn_w), np.float32))
            _bn_leaves(p, pred, sd, f"{src_p}.{name}.0.bn",
                       flat_prefix=f"{name}_bn")
            _set(p, pred + [f"{name}_out", "kernel"],
                 _lin(sd[f"{src_p}.{name}.1.weight"]))
            _set(p, pred + [f"{name}_out", "bias"],
                 _np(sd[f"{src_p}.{name}.1.bias"]))
    return p


def _identity_fuser(channels: int = 256, eps: float = 1e-3) -> Params:
    """Exact-identity ConvFuser params: 3x3 delta kernel + BN whose scale
    compensates the eps so (x - 0) * rsqrt(1 + eps) * scale == x. The
    trailing ReLU is a no-op because the sparse encoder's dense BEV is
    post-ReLU (conv_out, sparse_encoder.py:128). Used when importing the
    reference's lidar-only assembly, which has NO fuser module
    (fusion_models/bevfusion.py fuses only with >1 modality) while
    BEVFusionDetector always applies one."""
    k = np.zeros((3, 3, channels, channels), np.float32)
    k[1, 1] = np.eye(channels, dtype=np.float32)
    return {
        "fuse": {
            "conv": {"kernel": k},
            "bn_scale": np.full(channels, np.sqrt(1.0 + eps), np.float32),
            "bn_bias": np.zeros(channels, np.float32),
            "bn_mean": np.zeros(channels, np.float32),
            "bn_var": np.ones(channels, np.float32),
        }
    }


def import_bevfusion(sd: Dict, use_camera: bool = True) -> Params:
    """Full reference detector state dict -> BEVFusionDetector params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Params = {}
    if use_camera and any(k.startswith("encoders.camera.") for k in sd):
        p["camera_backbone"] = import_swin(sd, "encoders.camera.backbone.")
        p["camera_neck"] = import_lss_fpn(sd, "encoders.camera.neck.")
        p["vtransform"] = import_depth_lss(sd, "encoders.camera.vtransform.")
    p["lidar_encoder"] = import_sparse_encoder(sd, "encoders.lidar.backbone.")
    if "fuser.0.weight" not in sd:
        p["fuser"] = _identity_fuser()
    else:
        p["fuser"] = import_fuser(
            sd, "fuser.", camera_channels=80 if use_camera else 0
        )
    p["backbone"] = import_second(sd, "decoder.backbone.")
    p["neck"] = import_second_fpn(sd, "decoder.neck.")
    p["head"] = import_transfusion_head(sd, "heads.object.")
    return p

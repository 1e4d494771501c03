"""BEVFusion detector building blocks — lidar branch (TPU-native).

Re-designed equivalents of the reference detector's lidar path
(/root/reference/bevfusion/mmdet3d/models/):
  * HardSimpleVFE        — voxel_encoders: mean of the points in each voxel
  * SparseEncoderTPU     — backbones/sparse_encoder.py:11-218 ('basicblock'
    plan of configs/nuscenes/det/transfusion/secfpn/camera+lidar/default.yaml:
    conv_input subm 5->16; stages [16,16,32] [32,32,64] [64,64,128] [128,128]
    where each stage ends in a stride-2 SparseConv except the last; conv_out
    k=(1,1,3) s=(1,1,2) -> 128ch at z-depth 2; densified to a BEV map with
    channels C*D)
  * SECONDBackbone       — backbones/second.py:14-87
  * SECONDFPN            — necks/second.py:12-100
  * ConvFuser            — fusers/conv.py (concat -> 3x3 conv BN ReLU)

The sparse convolutions run through mobi_tpu.ops.sparse_conv: rulebooks are
planned HOST-side once per point cloud (`plan_sparse_encoder`), the device
program is gather + batched GEMM + segment-sum. Coordinates are (x, y, z)
with sparse_shape (X, Y, Z) — the reference's [1024, 1024, 41].

The TransFusion detection head lives in this module (`TransFusionHead`) and
the camera branch in `mobi_tpu/models/swin.py` (Swin-T + GeneralizedLSSFPN)
plus `DepthLSSTransform` below; `BEVFusionDetector` composes the full
camera+lidar model.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.ops.sparse_conv import (
    Rulebook,
    build_rulebook,
    pad_rulebook,
    sparse_conv_apply,
)

Array = jnp.ndarray

# ('basicblock' plan) per stage: (channels of each block, strided-conv pad)
ENCODER_STAGES = (
    ((16, 16), 32, (1, 1, 1)),
    ((32, 32), 64, (1, 1, 1)),
    ((64, 64), 128, (1, 1, 0)),
    ((128, 128), None, None),     # last stage: no strided conv
)


def hard_simple_vfe(voxels: Array, num_points: Array) -> Array:
    """[V, max_pts, F], [V] -> [V, F] mean over the real points
    (mmdet3d voxel_encoders HardSimpleVFE)."""
    denom = jnp.maximum(num_points[:, None], 1).astype(voxels.dtype)
    return voxels.sum(axis=1) / denom


def plan_sparse_encoder(
    coords: np.ndarray,
    sparse_shape: Sequence[int],
    static_caps: Optional[Sequence[int]] = None,
) -> Tuple[Dict[str, Rulebook], np.ndarray, Tuple[int, int, int]]:
    """Host-side rulebook plan for SparseEncoderTPU.

    Returns ({name: Rulebook}, final coords, final spatial shape). Each
    stage's submanifold blocks share one rulebook; each stride-2 transition
    and the final (1,1,3)/(1,1,2) conv_out get their own.

    static_caps: optional per-stage voxel-count caps
    [stage0, stage1, ..., final] (len = num stages + 1). When given, every
    rulebook/out_coords is padded to these fixed sizes so SUCCESSIVE POINT
    CLOUDS COMPILE TO ONE PROGRAM — without it the jitted detector step
    recompiles per cloud, which is unusable through a TPU compile service.
    Raises if a cloud exceeds a cap (bump the caps, they are data-dependent
    upper bounds). Pad gather rows point at the zero feature row; pad
    scatter coords are out-of-bounds and dropped (mode="drop").
    """
    plans: Dict[str, Rulebook] = {}
    cur = np.asarray(coords, np.int64)
    shape = tuple(int(s) for s in sparse_shape)
    caps = list(static_caps) if static_caps is not None else None
    n_stages = len(ENCODER_STAGES)
    if caps is not None and len(caps) != n_stages + 1:
        raise ValueError(
            f"static_caps needs {n_stages + 1} entries, got {len(caps)}"
        )

    # stage = the rulebook input's resolution level; pairs-per-offset is
    # bounded by max(n_in, n_out) <= caps[level]
    def _pad_subm(rb: Rulebook, stage: int) -> Rulebook:
        if caps is None:
            return rb
        return pad_rulebook(
            rb, pairs_to=caps[stage], out_to=caps[stage], n_in=caps[stage]
        )

    def _pad_down(rb: Rulebook, stage: int) -> Rulebook:
        if caps is None:
            return rb
        return pad_rulebook(
            rb, pairs_to=caps[stage], out_to=caps[stage + 1], n_in=caps[stage]
        )

    plans["subm0"] = _pad_subm(build_rulebook(cur, (3, 3, 3), submanifold=True), 0)
    for i, (_, down_ch, pad) in enumerate(ENCODER_STAGES):
        if i > 0:
            plans[f"subm{i}"] = _pad_subm(
                build_rulebook(cur, (3, 3, 3), submanifold=True), i
            )
        if down_ch is not None:
            rb = build_rulebook(
                cur, (3, 3, 3), stride=(2, 2, 2), padding=pad,
                spatial_shape=shape, submanifold=False,
            )
            plans[f"down{i}"] = _pad_down(rb, i)
            cur = rb.out_coords.astype(np.int64)
            shape = tuple(
                (shape[d] + 2 * pad[d] - 3) // 2 + 1 for d in range(3)
            )
    rb_out = build_rulebook(
        cur, (1, 1, 3), stride=(1, 1, 2), padding=(0, 0, 0),
        spatial_shape=shape, submanifold=False,
    )
    last = n_stages - 1
    plans["out"] = (
        pad_rulebook(rb_out, pairs_to=caps[last], out_to=caps[last + 1],
                     n_in=caps[last])
        if caps is not None else rb_out
    )
    out_shape = (shape[0], shape[1], (shape[2] - 3) // 2 + 1)
    out_coords = plans["out"].out_coords.astype(np.int64)
    return plans, out_coords, out_shape


def _bn(mdl, name, x, c, eps=1e-3):
    scale = mdl.param(f"{name}_scale", nn.initializers.ones, (c,), jnp.float32)
    bias = mdl.param(f"{name}_bias", nn.initializers.zeros, (c,), jnp.float32)
    mean = mdl.param(f"{name}_mean", nn.initializers.zeros, (c,), jnp.float32)
    var = mdl.param(f"{name}_var", nn.initializers.ones, (c,), jnp.float32)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


class _SparseConvBN(nn.Module):
    """weights [K, Cin, Cout] + BN(eps 1e-3) + ReLU over sparse rows."""

    out_ch: int
    k: int = 27
    relu: bool = True

    @nn.compact
    def __call__(self, feats: Array, rb: Rulebook) -> Array:
        w = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.k, feats.shape[-1], self.out_ch), jnp.float32,
        )
        h = sparse_conv_apply(feats, w, rb)
        h = _bn(self, "bn", h, self.out_ch)
        return nn.relu(h) if self.relu else h


class _SparseBasicBlock(nn.Module):
    """Two subm convs with a residual (mmdet3d SparseBasicBlock)."""

    ch: int

    @nn.compact
    def __call__(self, feats: Array, rb: Rulebook) -> Array:
        h = _SparseConvBN(self.ch, name="conv1")(feats, rb)
        h = _SparseConvBN(self.ch, relu=False, name="conv2")(h, rb)
        return nn.relu(h + feats)


class SparseEncoderTPU(nn.Module):
    """Sparse voxel encoder -> dense BEV map [1, X_out, Y_out, C*D]."""

    in_channels: int = 5
    base_channels: int = 16
    output_channels: int = 128

    @nn.compact
    def __call__(
        self,
        feats: Array,
        plans: Dict[str, Rulebook],
        out_coords: np.ndarray,
        out_shape: Tuple[int, int, int],
    ) -> Array:
        h = _SparseConvBN(self.base_channels, name="conv_input")(
            feats, plans["subm0"]
        )
        for i, (block_chs, down_ch, _) in enumerate(ENCODER_STAGES):
            rb = plans[f"subm{i}"]
            for j, ch in enumerate(block_chs):
                h = _SparseBasicBlock(ch, name=f"stage{i}_block{j}")(h, rb)
            if down_ch is not None:
                h = _SparseConvBN(down_ch, name=f"stage{i}_down")(
                    h, plans[f"down{i}"]
                )
        h = _SparseConvBN(self.output_channels, k=3, name="conv_out")(
            h, plans["out"]
        )
        # densify: [V, C] at (x, y, z) -> [1, X, Y, Z*C]
        X, Y, Z = out_shape
        dense = jnp.zeros((X, Y, Z, self.output_channels), h.dtype)
        oc = jnp.asarray(out_coords)
        # mode="drop": static-shape plans pad out_coords with out-of-bounds
        # sentinel rows that must not land in the grid
        dense = dense.at[oc[:, 0], oc[:, 1], oc[:, 2]].set(h, mode="drop")
        return dense.reshape(1, X, Y, Z * self.output_channels)


class _ConvBNReLU(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.ch, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
            param_dtype=jnp.float32, name="conv",
        )(x)
        x = _bn(self, "bn", x, self.ch)
        return nn.relu(x)


class SECONDBackbone(nn.Module):
    """Dense BEV backbone (backbones/second.py:14-87)."""

    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        outs = []
        for i, (ch, n, s) in enumerate(
            zip(self.out_channels, self.layer_nums, self.layer_strides)
        ):
            x = _ConvBNReLU(ch, stride=s, name=f"stage{i}_conv0")(x)
            for j in range(n):
                x = _ConvBNReLU(ch, name=f"stage{i}_conv{j + 1}")(x)
            outs.append(x)
        return outs


class SECONDFPN(nn.Module):
    """Upsample + concat neck (necks/second.py:12-100). upsample_strides=1
    uses a 1x1 conv (use_conv_for_no_stride), >1 a stride-k deconv."""

    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        ups = []
        for i, (x, ch, s) in enumerate(
            zip(xs, self.out_channels, self.upsample_strides)
        ):
            if s > 1:
                x = nn.ConvTranspose(
                    ch, (s, s), strides=(s, s), use_bias=False,
                    param_dtype=jnp.float32, name=f"deblock{i}_up",
                )(x)
            else:
                x = nn.Conv(
                    ch, (1, 1), use_bias=False, param_dtype=jnp.float32,
                    name=f"deblock{i}_conv",
                )(x)
            x = _bn(self, f"deblock{i}_bn", x, ch)
            ups.append(nn.relu(x))
        return jnp.concatenate(ups, axis=-1)


class ConvFuser(nn.Module):
    """Camera+lidar BEV fusion: concat -> 3x3 conv BN ReLU
    (fusers/conv.py)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Array:
        x = jnp.concatenate(list(feats), axis=-1)
        return _ConvBNReLU(self.out_channels, name="fuse")(x)


def build_sparse_depth_map(
    points: np.ndarray,
    lidar2image: np.ndarray,
    image_size: Tuple[int, int],
) -> np.ndarray:
    """Host-side sparse depth map for DepthLSSTransform
    (vtransforms/base.py:241-280): project lidar points per camera, keep
    in-frame hits, scatter ray distance into a [N_cam, iH, iW, 1] map."""
    iH, iW = image_size
    n_cam = len(lidar2image)
    depth = np.zeros((n_cam, iH, iW, 1), np.float32)
    pts = np.asarray(points)[:, :3]
    hom = np.concatenate([pts, np.ones((len(pts), 1))], 1)
    for c in range(n_cam):
        proj = hom @ np.asarray(lidar2image[c]).reshape(4, 4).T
        dist = proj[:, 2]
        z = np.clip(dist, 1e-5, 1e5)
        u = proj[:, 0] / z
        v = proj[:, 1] / z
        keep = (u >= 0) & (u < iW) & (v >= 0) & (v < iH)
        depth[c, v[keep].astype(int), u[keep].astype(int), 0] = dist[keep]
    return depth


class DepthLSSTransformTPU(nn.Module):
    """Lift-Splat-Shoot camera->BEV view transform with lidar depth guidance
    (vtransforms/depth_lss.py:15-101 + base.py:21-206).

    Per camera: a small CNN encodes the sparse lidar depth map, concatenated
    with the image features; depthnet predicts a D-bin depth distribution and
    C context channels; the outer product lifts features into the camera
    frustum; frustum points are mapped to lidar-frame voxels via
    camera2lidar @ K^-1 and pooled into the BEV grid with
    mobi_tpu.ops.voxel_ops.bev_pool (the CUDA bev_pool equivalent).
    """

    in_channels: int = 256
    out_channels: int = 80
    image_size: Tuple[int, int] = (256, 704)
    feature_size: Tuple[int, int] = (32, 88)
    xbound: Tuple[float, float, float] = (-54.0, 54.0, 0.3)
    ybound: Tuple[float, float, float] = (-54.0, 54.0, 0.3)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    downsample: int = 2

    @property
    def D(self) -> int:
        return int(round((self.dbound[1] - self.dbound[0]) / self.dbound[2]))

    def frustum(self) -> Array:
        """[D, fH, fW, 3] (u, v, depth) sample points (base.py:53-77)."""
        iH, iW = self.image_size
        fH, fW = self.feature_size
        ds = self.dbound[0] + self.dbound[2] * jnp.arange(self.D, dtype=jnp.float32)
        xs = jnp.linspace(0, iW - 1, fW)
        ys = jnp.linspace(0, iH - 1, fH)
        d, y, x = jnp.meshgrid(ds, ys, xs, indexing="ij")
        return jnp.stack([x, y, d], axis=-1)

    def geometry(self, cam2lidar: Array, intrins: Array) -> Array:
        """Frustum -> lidar-frame xyz [N, D, fH, fW, 3] (base.py:79-122;
        image augmentation matrices are identity at eval)."""
        fr = self.frustum()
        uvd = jnp.concatenate(
            [fr[..., :2] * fr[..., 2:3], fr[..., 2:3]], axis=-1
        )  # [D, fH, fW, 3]
        combine = jnp.einsum(
            "nij,njk->nik", cam2lidar[:, :3, :3], jnp.linalg.inv(intrins)
        )
        pts = jnp.einsum("nij,dhwj->ndhwi", combine, uvd)
        return pts + cam2lidar[:, None, None, None, :3, 3]

    @nn.compact
    def __call__(
        self, img_feats: Array, depth_map: Array, cam2lidar: Array,
        intrins: Array,
    ) -> Array:
        """img_feats [N, fH, fW, Cin]; depth_map [N, iH, iW, 1];
        cam2lidar [N, 4, 4]; intrins [N, 3, 3] -> BEV [1, X, Y, C]."""
        n = img_feats.shape[0]

        d = nn.Conv(8, (1, 1), param_dtype=jnp.float32, name="dt_conv0")(depth_map)
        d = nn.relu(_bn(self, "dt_bn0", d, 8, eps=1e-5))
        d = nn.Conv(32, (5, 5), strides=(4, 4), padding=((2, 2), (2, 2)),
                    param_dtype=jnp.float32, name="dt_conv1")(d)
        d = nn.relu(_bn(self, "dt_bn1", d, 32, eps=1e-5))
        d = nn.Conv(64, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)),
                    param_dtype=jnp.float32, name="dt_conv2")(d)
        d = nn.relu(_bn(self, "dt_bn2", d, 64, eps=1e-5))

        x = jnp.concatenate([d, img_feats], axis=-1)
        x = nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                    param_dtype=jnp.float32, name="dn_conv0")(x)
        x = nn.relu(_bn(self, "dn_bn0", x, self.in_channels, eps=1e-5))
        x = nn.Conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                    param_dtype=jnp.float32, name="dn_conv1")(x)
        x = nn.relu(_bn(self, "dn_bn1", x, self.in_channels, eps=1e-5))
        x = nn.Conv(self.D + self.out_channels, (1, 1),
                    param_dtype=jnp.float32, name="dn_out")(x)

        depth = jax.nn.softmax(x[..., : self.D], axis=-1)       # [N, fH, fW, D]
        ctx = x[..., self.D:]                                   # [N, fH, fW, C]
        lifted = depth[..., None] * ctx[..., None, :]           # [N, fH, fW, D, C]
        lifted = lifted.transpose(0, 3, 1, 2, 4)                # [N, D, fH, fW, C]

        geom = self.geometry(cam2lidar, intrins)                # [N, D, fH, fW, 3]
        lo = jnp.asarray([self.xbound[0], self.ybound[0], self.zbound[0]])
        dx = jnp.asarray([self.xbound[2], self.ybound[2], self.zbound[2]])
        nx = [
            int(round((b[1] - b[0]) / b[2]))
            for b in (self.xbound, self.ybound, self.zbound)
        ]
        # reference quantization truncates toward zero, not floor
        # (base.py:135 `((geom - (bx - dx/2)) / dx).long()`)
        vox = ((geom - lo) / dx).astype(jnp.int32)

        from mobi_tpu.ops.voxel_ops import bev_pool

        flat_feats = lifted.reshape(-1, self.out_channels)
        coords = jnp.concatenate(
            [
                jnp.zeros((flat_feats.shape[0], 1), jnp.int32),  # batch 0
                vox.reshape(-1, 3)[:, 2:3],                       # z
                vox.reshape(-1, 3)[:, 0:1],                       # x
                vox.reshape(-1, 3)[:, 1:2],                       # y
            ],
            axis=1,
        )
        bev = bev_pool(flat_feats, coords, 1, nx[2], nx[0], nx[1])
        # [1, Z, X, Y, C] -> [1, X, Y, Z*C]
        bev = bev.transpose(0, 2, 3, 1, 4).reshape(
            1, nx[0], nx[1], nx[2] * self.out_channels
        )

        if self.downsample > 1:
            bev = _ConvBNReLU(self.out_channels, name="ds_conv0")(bev)
            bev = _ConvBNReLU(self.out_channels, stride=self.downsample,
                              name="ds_conv1")(bev)
            bev = _ConvBNReLU(self.out_channels, name="ds_conv2")(bev)
        return bev


class _PosEmbedLearned(nn.Module):
    """Learned positional embedding over (x, y) query positions
    (models/utils/transformer.py:14-30): 1x1 conv -> BN -> ReLU -> 1x1."""

    ch: int

    @nn.compact
    def __call__(self, pos: Array) -> Array:  # [B, P, 2] -> [B, P, C]
        h = nn.Dense(self.ch, param_dtype=jnp.float32, name="fc1")(pos)
        h = _bn(self, "bn", h, self.ch, eps=1e-5)
        h = nn.relu(h)
        return nn.Dense(self.ch, param_dtype=jnp.float32, name="fc2")(h)


class _MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (biased q/k/v/out projections),
    dropout disabled (inference)."""

    ch: int
    heads: int

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        from mobi_tpu.ops.attention import dot_product_attention

        qp = nn.Dense(self.ch, param_dtype=jnp.float32, name="q")(q)
        kp = nn.Dense(self.ch, param_dtype=jnp.float32, name="k")(k)
        vp = nn.Dense(self.ch, param_dtype=jnp.float32, name="v")(v)
        out = dot_product_attention(qp, kp, vp, num_heads=self.heads,
                                    backend="xla")
        return nn.Dense(self.ch, param_dtype=jnp.float32, name="out")(out)


class _DecoderLayer(nn.Module):
    """DETR-style post-norm decoder layer with learned pos embeddings
    (models/utils/transformer.py:33-110)."""

    ch: int
    heads: int
    ffn: int

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos):
        qe = _PosEmbedLearned(self.ch, name="self_posembed")(query_pos)
        ke = _PosEmbedLearned(self.ch, name="cross_posembed")(key_pos)

        h = _MHA(self.ch, self.heads, name="self_attn")(
            query + qe, query + qe, query + qe
        )
        query = nn.LayerNorm(name="norm1")(query + h)
        h = _MHA(self.ch, self.heads, name="cross_attn")(
            query + qe, key + ke, key + ke
        )
        query = nn.LayerNorm(name="norm2")(query + h)
        h = nn.Dense(self.ffn, param_dtype=jnp.float32, name="linear1")(query)
        h = nn.Dense(self.ch, param_dtype=jnp.float32, name="linear2")(nn.relu(h))
        return nn.LayerNorm(name="norm3")(query + h)


class _PredictionFFN(nn.Module):
    """Per-quantity 1x1 conv heads (models/utils/transformer.py:496-545):
    center 2, height 1, dim 3, rot 2, vel 2, heatmap num_classes."""

    num_classes: int
    head_conv: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:  # [B, P, C]
        out = {}
        specs = dict(center=2, height=1, dim=3, rot=2, vel=2,
                     heatmap=self.num_classes)
        for name, ch in specs.items():
            h = nn.Dense(self.head_conv, param_dtype=jnp.float32,
                         name=f"{name}_fc")(x)
            h = _bn(self, f"{name}_bn", h, self.head_conv, eps=1e-5)
            h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(-2.19) if name == "heatmap"
                else nn.initializers.zeros
            )
            out[name] = nn.Dense(
                ch, param_dtype=jnp.float32, bias_init=bias_init,
                name=f"{name}_out",
            )(h)
        return out


class TransFusionHeadTPU(nn.Module):
    """TransFusion detection head, inference path
    (heads/bbox/transfusion.py:37-345 + get_bboxes:715-800), static shapes:

      BEV feature [B, H, W, in] -> dense heatmap -> local-max suppression
      (k=3; identity for pedestrian/traffic_cone classes 8/9) -> top-K
      proposals over (class, cell) -> class-encoded queries -> transformer
      decoder (self + BEV cross attention with learned pos embeddings) ->
      per-quantity FFN heads; box decoding per TransFusionBBoxCoder.

    This module is the eval path producing boxes for DetectionEval; the
    training losses (Hungarian matching + focal/L1) live in
    mobi_tpu.models.transfusion_loss / detector_training.
    """

    num_classes: int = 10
    num_proposals: int = 200
    hidden: int = 128
    num_decoder_layers: int = 1
    heads: int = 8
    ffn: int = 256
    nms_kernel: int = 3
    out_size_factor: int = 8
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    pc_range: Tuple[float, float] = (-54.0, -54.0)
    identity_nms_classes: Tuple[int, ...] = (8, 9)

    @nn.compact
    def __call__(self, bev: Array) -> Dict[str, Array]:
        B, H, W, _ = bev.shape
        feat = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                       param_dtype=jnp.float32, name="shared_conv")(bev)

        h = _ConvBNReLU(self.hidden, name="heatmap_conv")(feat)
        dense_heatmap = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            bias_init=nn.initializers.constant(-2.19),
            param_dtype=jnp.float32, name="heatmap_out",
        )(h)  # [B, H, W, C]

        heatmap = jax.nn.sigmoid(dense_heatmap)
        # local-maximum suppression (transfusion.py:239-266)
        k = self.nms_kernel
        pad = k // 2
        inner = jax.lax.reduce_window(
            heatmap, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            "VALID",
        )
        local_max = jnp.zeros_like(heatmap)
        local_max = local_max.at[:, pad:H - pad, pad:W - pad, :].set(inner)
        ident = jnp.asarray(
            [c in self.identity_nms_classes for c in range(self.num_classes)]
        )
        local_max = jnp.where(ident[None, None, None, :], heatmap, local_max)
        peaks = heatmap * (heatmap == local_max)

        # top-K proposals over (class, cell)
        flat = peaks.transpose(0, 3, 1, 2).reshape(B, -1)  # [B, C*HW]
        _, top = jax.lax.top_k(flat, self.num_proposals)
        hw = H * W
        top_class = top // hw                                  # [B, P]
        top_index = top % hw

        feat_flat = feat.reshape(B, hw, self.hidden)
        query_feat = jnp.take_along_axis(
            feat_flat, top_index[..., None], axis=1
        )  # [B, P, hidden]
        one_hot = jax.nn.one_hot(top_class, self.num_classes)
        query_feat = query_feat + nn.Dense(
            self.hidden, param_dtype=jnp.float32, name="class_encoding"
        )(one_hot)

        # bev grid positions (cell centers +0.5, create_2D_grid)
        ys, xs = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        bev_pos = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1) + 0.5
        bev_pos = jnp.broadcast_to(bev_pos, (B, hw, 2))
        query_pos = jnp.take_along_axis(bev_pos, top_index[..., None], axis=1)

        heat_flat = peaks.transpose(0, 3, 1, 2).reshape(B, self.num_classes, hw)
        query_heat_score = jnp.take_along_axis(
            heat_flat, top_index[:, None, :].repeat(self.num_classes, 1),
            axis=2,
        ).transpose(0, 2, 1)  # [B, P, C]

        preds = None
        for i in range(self.num_decoder_layers):
            query_feat = _DecoderLayer(
                self.hidden, self.heads, self.ffn, name=f"decoder{i}"
            )(query_feat, feat_flat, query_pos, bev_pos)
            preds = _PredictionFFN(self.num_classes, name=f"pred{i}")(query_feat)
            preds["center"] = preds["center"] + query_pos
            query_pos = jax.lax.stop_gradient(preds["center"])

        preds["query_heatmap_score"] = query_heat_score
        preds["query_labels"] = top_class
        preds["dense_heatmap"] = dense_heatmap
        return preds

    def decode_boxes(
        self, preds: Dict[str, Array],
        post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
        score_threshold: float = 0.0,
    ) -> Dict[str, Array]:
        """TransFusionBBoxCoder.decode + get_bboxes score fusion
        (coders/transfusion_bbox_coder.py:39-100, transfusion.py:723-732).
        Static shapes: returns per-proposal boxes with a `keep` mask."""
        one_hot = jax.nn.one_hot(preds["query_labels"], self.num_classes)
        score = (
            jax.nn.sigmoid(preds["heatmap"])
            * preds["query_heatmap_score"] * one_hot
        )  # [B, P, C]
        labels = jnp.argmax(score, axis=-1)
        scores = jnp.max(score, axis=-1)

        cx = (preds["center"][..., 0] * self.out_size_factor
              * self.voxel_size[0] + self.pc_range[0])
        cy = (preds["center"][..., 1] * self.out_size_factor
              * self.voxel_size[1] + self.pc_range[1])
        dim = jnp.exp(preds["dim"])
        z = preds["height"][..., 0] - dim[..., 2] * 0.5  # gravity -> bottom
        yaw = jnp.arctan2(preds["rot"][..., 0], preds["rot"][..., 1])
        boxes = jnp.concatenate(
            [
                jnp.stack([cx, cy, z], -1), dim, yaw[..., None],
                preds["vel"],
            ],
            axis=-1,
        )  # [B, P, 9]
        lo = jnp.asarray(post_center_range[:3])
        hi = jnp.asarray(post_center_range[3:])
        keep = (
            (scores > score_threshold)
            & (boxes[..., :3] >= lo).all(-1)
            & (boxes[..., :3] <= hi).all(-1)
        )
        return {"bboxes": boxes, "scores": scores, "labels": labels,
                "keep": keep}


class LidarBEVNetwork(nn.Module):
    """Voxel features -> BEV feature map for the detection head: sparse
    encoder -> SECOND -> FPN (the lidar-only detector body)."""

    sparse = SparseEncoderTPU
    vfe_channels: int = 5

    @nn.compact
    def __call__(self, feats, plans, out_coords, out_shape) -> Array:
        bev = SparseEncoderTPU(name="encoder")(
            feats, plans, out_coords, out_shape
        )
        outs = SECONDBackbone(name="backbone")(bev)
        return SECONDFPN(name="neck")(outs)


class BEVFusionDetector(nn.Module):
    """Full camera+lidar detector composition
    (fusion_models/bevfusion.py:25-310, inference path):

      camera: Swin-T -> GeneralizedLSSFPN -> DepthLSSTransform -> BEV
      lidar:  hard voxelize (host) -> HardSimpleVFE -> SparseEncoderTPU -> BEV
      fusion: ConvFuser -> SECOND -> SECONDFPN -> TransFusionHead -> boxes

    Host-side inputs are prepared by `prepare_lidar_inputs` /
    `build_sparse_depth_map` (irregular index work stays off-device; the
    device program is static-shape). `use_camera=False` gives the lidar-only
    voxelnet configuration.
    """

    use_camera: bool = True
    num_classes: int = 10
    num_proposals: int = 200
    camera_out: int = 80
    fuse_channels: int = 256
    lss_kwargs: Optional[Dict] = None
    head_kwargs: Optional[Dict] = None  # e.g. voxel_size/pc_range overrides

    def setup(self):
        from mobi_tpu.models.swin import GeneralizedLSSFPN, SwinTransformerTPU

        if self.use_camera:
            self.camera_backbone = SwinTransformerTPU()
            self.camera_neck = GeneralizedLSSFPN(out_channels=256)
            self.vtransform = DepthLSSTransformTPU(
                in_channels=256, out_channels=self.camera_out,
                **(self.lss_kwargs or {}),
            )
        self.lidar_encoder = SparseEncoderTPU()
        self.fuser = ConvFuser(out_channels=self.fuse_channels)
        self.backbone = SECONDBackbone()
        self.neck = SECONDFPN()
        self.head = TransFusionHeadTPU(
            num_classes=self.num_classes, num_proposals=self.num_proposals,
            **(self.head_kwargs or {}),
        )

    def __call__(
        self,
        voxel_feats: Array,
        plans: Dict[str, Rulebook],
        out_coords: np.ndarray,
        out_shape: Tuple[int, int, int],
        images: Array | None = None,
        depth_map: Array | None = None,
        cam2lidar: Array | None = None,
        intrins: Array | None = None,
    ) -> Dict[str, Array]:
        lidar_bev = self.lidar_encoder(voxel_feats, plans, out_coords, out_shape)
        if self.use_camera:
            feats = self.camera_backbone(images)
            feats = self.camera_neck(feats)
            cam_bev = self.vtransform(feats[0], depth_map, cam2lidar, intrins)
            # LSS grid and the sparse-encoder BEV share the detector grid;
            # resize guards small mismatches from padding arithmetic
            if cam_bev.shape[1:3] != lidar_bev.shape[1:3]:
                cam_bev = jax.image.resize(
                    cam_bev, lidar_bev.shape[:3] + (cam_bev.shape[-1],),
                    method="bilinear",
                )
            x = self.fuser([cam_bev, lidar_bev])
        else:
            x = self.fuser([lidar_bev])
        x = self.neck(self.backbone(x))
        return self.head(x)

    @nn.nowrap
    def decode(self, preds: Dict[str, Array]) -> Dict[str, Array]:
        # decode_boxes is pure math over config fields; build the module
        # directly (nowrap: outside the flax method-wrapping machinery) so
        # decode works OUTSIDE init/apply, where setup attributes like
        # self.head don't exist
        return TransFusionHeadTPU(
            num_classes=self.num_classes, num_proposals=self.num_proposals,
            **(self.head_kwargs or {}),
        ).decode_boxes(preds)


def prepare_lidar_inputs(
    points: np.ndarray,
    voxel_size=(0.075, 0.075, 0.2),
    pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    max_points: int = 10,
    max_voxels: int = 120000,
    static_caps: Optional[Sequence[int]] = None,
):
    """Host-side stage: hard voxelize + mean VFE + sparse-conv plans
    (the reference's voxelize()+SparseEncoder indice build).

    static_caps: per-level voxel caps (see plan_sparse_encoder). When set,
    voxel features are zero-padded to static_caps[0] rows and every plan is
    padded to fixed shapes, so every cloud produces IDENTICALLY-SHAPED
    inputs — the jitted detector step then compiles exactly once.
    `default_static_caps(max_voxels)` gives a safe schedule.
    """
    from mobi_tpu import native

    voxels, coords, npv = native.hard_voxelize(
        points, voxel_size, pc_range, max_points=max_points,
        max_voxels=max_voxels,
    )
    feats = hard_simple_vfe(jnp.asarray(voxels), jnp.asarray(npv))
    nx, ny, nz = (
        int(round((pc_range[i + 3] - pc_range[i]) / voxel_size[i]))
        for i in range(3)
    )
    # the reference's sparse_shape pads z by ONE over the voxel grid
    # ([1440, 1440, 41] vs grid z 40, det config swint_v0p075/default.yaml)
    # so the encoder's z-ladder ends at depth 2 and the dense lidar BEV is
    # 2*128 = 256 channels — required for checkpoint-imported fuser parity
    grid = (nx, ny, nz + 1)
    plans, out_coords, out_shape = plan_sparse_encoder(
        coords, grid, static_caps=static_caps
    )
    if static_caps is not None:
        if feats.shape[0] > static_caps[0]:
            raise ValueError(
                f"{feats.shape[0]} voxels exceed static_caps[0]="
                f"{static_caps[0]}"
            )
        feats = jnp.concatenate(
            [
                feats,
                jnp.zeros(
                    (static_caps[0] - feats.shape[0], feats.shape[1]),
                    feats.dtype,
                ),
            ],
            axis=0,
        )
    return feats, plans, out_coords, out_shape


def calibrate_static_caps(
    point_clouds,
    voxel_size=(0.075, 0.075, 0.2),
    pc_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    max_points: int = 10,
    max_voxels: int = 120000,
    margin: float = 1.25,
    multiple: int = 1024,
) -> Tuple[int, ...]:
    """Derive per-level static caps from sample clouds.

    Voxelizes each cloud and runs the UNCAPPED sparse-encoder plan,
    tracking the per-level site-count maxima (input voxels, after each
    stride-2 transition, after conv_out). Returns maxima * margin rounded
    up to `multiple` — feed to `prepare_lidar_inputs(static_caps=...)`.

    `default_static_caps` hard-codes a contraction schedule measured on
    real lidar (surface-like clouds shrink 2-4x per stride-2 level);
    sparser or noisier distributions can EXPAND at transitions (an
    isolated voxel reaches up to 8 stride-2 outputs), so data-derived
    caps are the robust route when the cloud statistics are unknown.
    """
    from mobi_tpu import native

    nx, ny, nz = (
        int(round((pc_range[i + 3] - pc_range[i]) / voxel_size[i]))
        for i in range(3)
    )
    grid = (nx, ny, nz + 1)  # z+1, matching prepare_lidar_inputs
    n_levels = len(ENCODER_STAGES) + 1
    maxima = [0] * n_levels
    for pts in point_clouds:
        _, coords, _ = native.hard_voxelize(
            np.asarray(pts), voxel_size, pc_range, max_points=max_points,
            max_voxels=max_voxels,
        )
        plans, out_coords, _ = plan_sparse_encoder(coords, grid)
        maxima[0] = max(maxima[0], len(coords))
        for i in range(len(ENCODER_STAGES) - 1):
            maxima[i + 1] = max(maxima[i + 1], plans[f"down{i}"].n_out)
        maxima[-1] = max(maxima[-1], len(out_coords))

    def up(v):
        return max(int(np.ceil(v * margin / multiple)) * multiple, multiple)

    caps = [up(v) for v in maxima]
    # level 0 rows are bounded by the voxelizer itself; don't pad past it
    caps[0] = min(caps[0], max_voxels)
    return tuple(caps)


def default_static_caps(max_voxels: int = 120000) -> Tuple[int, ...]:
    """Static voxel-cap schedule per sparse-encoder level for
    `prepare_lidar_inputs(static_caps=...)`.

    Level 0 = max_voxels. Stride-2 downsampling typically shrinks site
    counts ~2-4x on lidar clouds but CAN grow them for isolated voxels (a
    lone voxel reaches up to 8 stride-2 outputs), so the early levels stay
    conservative; the final (1,1,2)-stride level halves. Exceeding a cap
    raises in pad_rulebook — bump the schedule for denser clouds.
    """
    v = int(max_voxels)
    return (v, v, (3 * v) // 4, v // 2, v // 2)

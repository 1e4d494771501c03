"""RangeNet++ (darknet53) feature extractor for FRD — Frechet Range Distance.

Exact functional counterpart of the reference FRD pipeline
(/root/reference/eval_tool/lidar/frd_score.py:34-113 and
eval_tool/lidar/rangenet/model.py:1-371, config.yaml):

  * input: 5ch [depth_m, intensity, x, y, z] at 64 x 1024 (nearest resize),
    depth denormalized as (d+1)/2 * 54, invalid pixels (outside (1.4, 54) m)
    set to -1 in ALL channels;
  * Backbone: darknet53 with WIDTH-ONLY downsampling (per-stage conv stride
    [1, 2], OS=32 horizontally), skip taps before each width reduction;
  * Decoder: five [1,4]/[1,2] transposed-conv stages with skip additions,
    each followed by a Basic residual block; final 32-ch logits map;
  * FRD feature: 'depth' aggregation — split the 64 rows into 16 groups of
    4, mean over (rows-in-group, width) -> [B, 32*16=512];
  * Frechet distance between pred/orig feature sets (mobi_tpu.eval.frechet).

Weights import from the published RangeNet++ darknet53 checkpoint files
(`backbone` + `segmentation_decoder` torch state dicts,
model.py:330-336) via `import_rangenet_weights`.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# darknet53 residual-block counts per stage (model.py:40-42, layers=53)
DARKNET53_BLOCKS = (1, 2, 8, 8, 4)
STAGE_CH = ((32, 64), (64, 128), (128, 256), (256, 512), (512, 1024))
DEC_CH = ((1024, 512), (512, 256), (256, 128), (128, 64), (64, 32))


def _bn_params(mdl, name, c):
    scale = mdl.param(f"{name}_scale", nn.initializers.ones, (c,), jnp.float32)
    bias = mdl.param(f"{name}_bias", nn.initializers.zeros, (c,), jnp.float32)
    mean = mdl.param(f"{name}_mean", nn.initializers.zeros, (c,), jnp.float32)
    var = mdl.param(f"{name}_var", nn.initializers.ones, (c,), jnp.float32)
    return scale, bias, mean, var


def _bn(mdl, name, x, c):
    scale, bias, mean, var = _bn_params(mdl, name, c)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class ConvBnLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=((p, p), (p, p)), use_bias=False, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = _bn(self, "bn", x, self.features)
        return nn.leaky_relu(x, 0.1)


class BasicBlock(nn.Module):
    """1x1 squeeze -> 3x3 expand residual (model.py:10-34): planes = (mid,
    out) with out == input channels."""

    planes: Tuple[int, int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = ConvBnLeaky(self.planes[0], kernel=1, name="conv1")(x)
        h = ConvBnLeaky(self.planes[1], kernel=3, name="conv2")(h)
        return x + h


class ConvTransposeBnLeaky(nn.Module):
    """torch ConvTranspose2d(k=[1,4], s=[1,2], p=[0,1]) equivalent via a
    dilated conv with the flipped kernel (out width doubles exactly)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        # kernel stored HWIO like the torch-imported layout
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 4, in_ch, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        w_flip = w[::-1, ::-1]
        # convT(s=(1,2), p=(0,1), k=(1,4)) == conv(lhs_dilation=(1,2),
        # pad=(k-1-p)) with the spatially flipped kernel
        y = jax.lax.conv_general_dilated(
            x, w_flip,
            window_strides=(1, 1),
            padding=((0, 0), (2, 2)),
            lhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        y = _bn(self, "bn", y, self.features)
        return nn.leaky_relu(y, 0.1)


class RangeNetFRD(nn.Module):
    """[B, 64, 1024, 5] -> [B, 512] FRD feature (Model.forward with
    return_final_logits=True, agg_type='depth', model.py:338-370)."""

    n_groups: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        skips: Dict[int, Array] = {}
        os = 1

        h = ConvBnLeaky(32, kernel=3, name="stem")(x)
        for si, ((cin, cout), blocks) in enumerate(zip(STAGE_CH, DARKNET53_BLOCKS)):
            skips[os] = h           # tap BEFORE each width reduction
            os *= 2
            h = ConvBnLeaky(
                cout, kernel=3, stride=(1, 2), name=f"enc{si}_down"
            )(h)
            for bi in range(blocks):
                h = BasicBlock((cin, cout), name=f"enc{si}_block{bi}")(h)

        for di, (cin, cout) in enumerate(DEC_CH):
            h = ConvTransposeBnLeaky(cout, name=f"dec{di}_up")(h)
            os //= 2
            h = h + skips[os]
            h = BasicBlock((cin, cout), name=f"dec{di}_block")(h)

        # logits [B, 64, W, 32] -> depth aggregation: 16 row groups
        b, H, W, c = h.shape
        # torch layout view(B, C, N, H//N, W).mean([3,4]).reshape(B, -1)
        feat = h.transpose(0, 3, 1, 2).reshape(
            b, c, self.n_groups, H // self.n_groups, W
        ).mean(axis=(3, 4))
        return feat.reshape(b, c * self.n_groups)


def _nearest_resize_torch(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') indexing: src = floor(dst*in/out)."""
    h, w = x.shape[:2]
    ri = np.floor(np.arange(out_h) * h / out_h).astype(np.int64)
    ci = np.floor(np.arange(out_w) * w / out_w).astype(np.int64)
    return x[ri][:, ci]


def range_npy_to_input(
    npy: np.ndarray, out_h: int = 64, out_w: int = 1024,
    depth_interval: Tuple[float, float] = (1.4, 54.0),
) -> np.ndarray:
    """Saved (depth_norm, intensity, pitch, yaw) stack -> [H, W, 5] input
    (frd_score.py RangePathDataset:34-70): depth = (d+1)/2 * 54; pixels
    outside (1.4, 54) m get -1 in every channel; xyz from spherical."""
    depth_n, inten, pitch, yaw = npy[0], npy[1], npy[2], npy[3]
    depth_m = (depth_n + 1.0) / 2.0 * depth_interval[1]
    valid = (depth_m > depth_interval[0]) & (depth_m < depth_interval[1])
    x = np.cos(yaw) * np.cos(pitch) * depth_m
    y = -np.sin(yaw) * np.cos(pitch) * depth_m
    z = np.sin(pitch) * depth_m
    stack = np.stack([depth_m, inten, x, y, z], axis=-1).astype(np.float32)
    stack[~valid] = -1.0
    if stack.shape[:2] != (out_h, out_w):
        stack = _nearest_resize_torch(stack, out_h, out_w)
    return stack


def import_rangenet_weights(
    backbone_sd: Dict[str, np.ndarray],
    decoder_sd: Dict[str, np.ndarray],
) -> Dict:
    """(backbone, segmentation_decoder) torch state dicts -> RangeNetFRD
    params (published lidar-bonnetal darknet53 layout, model.py:330-336)."""
    out: Dict = {}

    def put(path: List[str], v):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(v)

    def conv_bn(dst: str, sd, conv_key: str, bn_key: str):
        put([*dst.split("/"), "conv", "kernel"],
            np.transpose(sd[f"{conv_key}.weight"], (2, 3, 1, 0)))
        put([*dst.split("/"), "bn_scale"], sd[f"{bn_key}.weight"])
        put([*dst.split("/"), "bn_bias"], sd[f"{bn_key}.bias"])
        put([*dst.split("/"), "bn_mean"], sd[f"{bn_key}.running_mean"])
        put([*dst.split("/"), "bn_var"], sd[f"{bn_key}.running_var"])

    def basic_block(dst: str, sd, src: str):
        conv_bn(f"{dst}/conv1", sd, f"{src}.conv1", f"{src}.bn1")
        conv_bn(f"{dst}/conv2", sd, f"{src}.conv2", f"{src}.bn2")

    conv_bn("stem", backbone_sd, "conv1", "bn1")
    for si, blocks in enumerate(DARKNET53_BLOCKS):
        conv_bn(f"enc{si}_down", backbone_sd,
                f"enc{si+1}.conv", f"enc{si+1}.bn")
        for bi in range(blocks):
            basic_block(f"enc{si}_block{bi}", backbone_sd,
                        f"enc{si+1}.residual_{bi}")

    for di in range(5):
        src = f"dec{5 - di}"
        # torch ConvTranspose2d weight [in, out, kh, kw] -> HWIO
        w = decoder_sd[f"{src}.upconv.weight"]
        put([f"dec{di}_up", "kernel"], np.transpose(w, (2, 3, 0, 1)))
        put([f"dec{di}_up", "bias"], decoder_sd[f"{src}.upconv.bias"])
        put([f"dec{di}_up", "bn_scale"], decoder_sd[f"{src}.bn.weight"])
        put([f"dec{di}_up", "bn_bias"], decoder_sd[f"{src}.bn.bias"])
        put([f"dec{di}_up", "bn_mean"], decoder_sd[f"{src}.bn.running_mean"])
        put([f"dec{di}_up", "bn_var"], decoder_sd[f"{src}.bn.running_var"])
        basic_block(f"dec{di}_block", decoder_sd, f"{src}.residual")
    return out

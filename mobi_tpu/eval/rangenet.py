"""RangeNet++ (darknet53) backbone for FRD — Frechet Range Distance.

Re-implementation of the reference's feature extractor
(/root/reference/eval_tool/lidar/frd_score.py:34-113 and
eval_tool/lidar/rangenet/model.py:1-371): a darknet53 encoder over 5-channel
range input (depth, intensity, x, y, z), whose final 1024-channel feature map
is depth-aggregated to a 512-d vector per sample, then Frechet distance
between pred/orig feature sets.

Input: 64 x 1024 range images rebuilt from the saved
`range_{pred,orig}` npys (depth, intensity, pitch, yaw) — the xyz channels
come from the spherical inverse projection.

Weights import from the published RangeNet++ darknet53 checkpoint
(`import_rangenet_weights`); structure mirrors its torch state dict.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# darknet53 layer plan: (blocks, out_channels) per stage
DARKNET53_PLAN = [(1, 64), (2, 128), (8, 256), (8, 512), (4, 1024)]


def _bn_params(mdl, name, c):
    scale = mdl.param(f"{name}_scale", nn.initializers.ones, (c,), jnp.float32)
    bias = mdl.param(f"{name}_bias", nn.initializers.zeros, (c,), jnp.float32)
    mean = mdl.param(f"{name}_mean", nn.initializers.zeros, (c,), jnp.float32)
    var = mdl.param(f"{name}_var", nn.initializers.ones, (c,), jnp.float32)
    return scale, bias, mean, var


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
        scale, bias, mean, var = _bn_params(self, "bn", self.features)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return nn.leaky_relu(x, 0.1)


class DarkResidual(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = ConvBnLeaky(self.features // 2, kernel=1, name="conv1")(x)
        h = ConvBnLeaky(self.features, kernel=3, name="conv2")(h)
        return x + h


class DarknetRangeFeatures(nn.Module):
    """5ch range image [B, 64, 1024, 5] -> [B, 512] FRD feature.

    RangeNet++ strides only the width axis (OS=32 horizontally, preserving
    the 64 beams); the final 1024-ch map is mean-pooled spatially and
    projected... the reference aggregates by splitting the 1024 channels in
    half and averaging pairs (frd_score.py:192-211 depth aggregation to 512).
    """

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = ConvBnLeaky(32, kernel=3, name="stem")(x)
        for si, (blocks, feats) in enumerate(DARKNET53_PLAN):
            h = ConvBnLeaky(
                feats, kernel=3, stride=(1, 2), name=f"down{si}"
            )(h)
            for bi in range(blocks):
                h = DarkResidual(feats, name=f"stage{si}_block{bi}")(h)
        # spatial mean -> [B, 1024]; aggregate channel pairs -> [B, 512]
        f = h.mean(axis=(1, 2))
        b, c = f.shape
        return f.reshape(b, c // 2, 2).mean(-1)


def range_npy_to_input(npy: np.ndarray, out_h: int = 64, out_w: int = 1024) -> np.ndarray:
    """Saved (depth, intensity, pitch, yaw) stack -> [H, W, 5] rangenet input
    (depth_m, intensity, x, y, z), resized (frd_score.py:60-113)."""
    import cv2

    from mobi_tpu.data.range_projection import denormalize_depth

    depth_n, inten, pitch, yaw = npy[0], npy[1], npy[2], npy[3]
    depth_m = denormalize_depth(depth_n)
    x = np.cos(yaw) * np.cos(pitch) * depth_m
    y = -np.sin(yaw) * np.cos(pitch) * depth_m
    z = np.sin(pitch) * depth_m
    stack = np.stack([depth_m, inten, x, y, z], axis=-1).astype(np.float32)
    if stack.shape[:2] != (out_h, out_w):
        stack = cv2.resize(stack, (out_w, out_h), interpolation=cv2.INTER_NEAREST)
    return stack


def import_rangenet_weights(state_dict: Dict[str, np.ndarray]) -> Dict:
    """RangeNet++ darknet backbone torch state dict -> params.

    torch keys: conv1/bn1 stem; enc{i}.conv/bn downsamples;
    enc{i}.residual{j}.conv{1,2}/bn{1,2} blocks (layout of the published
    lidar-bonnetal darknet53).
    """
    out: Dict = {}

    def put(path: List[str], v):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(v)

    def conv_bn(dst: str, conv_key: str, bn_key: str):
        put([*dst.split("/"), "conv", "kernel"],
            np.transpose(state_dict[f"{conv_key}.weight"], (2, 3, 1, 0)))
        put([*dst.split("/"), "bn_scale"], state_dict[f"{bn_key}.weight"])
        put([*dst.split("/"), "bn_bias"], state_dict[f"{bn_key}.bias"])
        put([*dst.split("/"), "bn_mean"], state_dict[f"{bn_key}.running_mean"])
        put([*dst.split("/"), "bn_var"], state_dict[f"{bn_key}.running_var"])

    conv_bn("stem", "backbone.conv1", "backbone.bn1")
    for si, (blocks, _) in enumerate(DARKNET53_PLAN):
        conv_bn(f"down{si}", f"backbone.enc{si+1}.conv", f"backbone.enc{si+1}.bn")
        for bi in range(blocks):
            base = f"backbone.enc{si+1}.residual_{bi}"
            conv_bn(f"stage{si}_block{bi}/conv1", f"{base}.conv1", f"{base}.bn1")
            conv_bn(f"stage{si}_block{bi}/conv2", f"{base}.conv2", f"{base}.bn2")
    return out

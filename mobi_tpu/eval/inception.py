"""InceptionV3 (pool3, 2048-d) feature extractor in flax — the FID backbone.

Mirrors the torchvision `inception_v3` graph used by the reference FID tool
(/root/reference/eval_tool/camera/inception.py:1-324, pytorch-fid variant):
input 299x299 in [-1, 1], BasicConv2d = conv (no bias) + BatchNorm(eps=1e-3)
+ ReLU, Mixed_5b..Mixed_7c inception blocks, global average pool -> 2048.

Weights are imported from a torchvision/pytorch-fid state dict via
`import_inception_weights` (no torchvision dependency at runtime).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=pad, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)
        # inference-only batchnorm: y = (x - mean) / sqrt(var + eps) * w + b
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (c,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _pool(x, kind, window=3, stride=1, padding=(1, 1)):
    pads = ((padding[0], padding[0]), (padding[1], padding[1]))
    if kind == "max":
        return nn.max_pool(x, (window, window), (stride, stride), pads)
    return nn.avg_pool(x, (window, window), (stride, stride), pads,
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _pool(x, "avg")
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _pool(x, "avg")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "max":
            bp = _pool(x, "max")
        else:
            bp = _pool(x, "avg")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[-1, 1] RGB NHWC (resized to 299x299 by the caller) -> [B, 2048]."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        # pytorch-fid uses max-pool in the last block's pool branch only for
        # the FID-specific weights; torchvision weights use avg. Keep avg to
        # match torchvision inception_v3.
        x = InceptionE(name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))


def import_inception_weights(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 state dict -> InceptionV3Features params."""
    out: Dict = {}

    def put(dst_parts, value):
        node = out
        for k in dst_parts[:-1]:
            node = node.setdefault(k, {})
        node[dst_parts[-1]] = value

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        # torchvision: <Block>.<branch>.conv.weight / .bn.{weight,bias,
        # running_mean,running_var}
        if parts[-2] == "conv" and parts[-1] == "weight":
            dst = parts[:-2] + ["conv", "kernel"]
            put(dst, np.transpose(val, (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(parts[-1])
            if name is None:
                continue
            put(parts[:-2] + [name], np.asarray(val))
    return out

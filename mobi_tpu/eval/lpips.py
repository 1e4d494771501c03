"""LPIPS (AlexNet backbone) in flax — the perceptual metric of the realism
bench (reference eval_tool/camera/lpips_score.py:1-99, also reused for the
lidar D-LPIPS / I-LPIPS scores over saved range PNGs).

Pipeline per the lpips package (v0.1, net='alex'):
  * input RGB in [-1, 1], normalized by shift (-.030,-.088,-.188) /
    scale (.458,.448,.450);
  * AlexNet features after each of the 5 ReLU stages;
  * unit-normalize channels, squared diff, 1x1 linear heads, spatial mean,
    sum over stages.

Weights import from the torch `lpips` package state dict
(`import_lpips_weights`); trunk weights from torchvision alexnet.
"""
from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (features, kernel, stride, padding) per conv layer; ReLU taps after each
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after stages 0 and 1 (and after 4, unused)


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        taps = []
        for i, (f, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(
                f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                param_dtype=jnp.float32, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), (2, 2))
        return taps


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        """x, y: [B, H, W, 3] in [-1, 1] -> [B] distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        net = AlexNetFeatures(name="net")
        fx = net(xn)
        fy = net(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a * jax.lax.rsqrt(jnp.sum(a**2, -1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b**2, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, param_dtype=jnp.float32,
                name=f"lin{i}",
            )(d)
            total = total + w.mean(axis=(1, 2, 3))
        return total


def import_lpips_weights(
    lpips_sd: Dict[str, np.ndarray], alexnet_sd: Dict[str, np.ndarray]
) -> Dict:
    """(lpips package 'alex' linear weights, torchvision alexnet trunk) ->
    LPIPS params."""
    params: Dict = {"net": {}}
    # torchvision alexnet feature convs at indices 0,3,6,8,10
    torch_idx = [0, 3, 6, 8, 10]
    for i, ti in enumerate(torch_idx):
        params["net"][f"conv{i}"] = {
            "kernel": np.transpose(alexnet_sd[f"features.{ti}.weight"], (2, 3, 1, 0)),
            "bias": np.asarray(alexnet_sd[f"features.{ti}.bias"]),
        }
    for i in range(5):
        w = lpips_sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
        params[f"lin{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return {"params": params}

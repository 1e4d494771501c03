import jax.numpy as jnp
import numpy as np
import torch

from mobi_tpu.ops.ranges import (
    depth_normalization,
    inverse_depth_normalization,
    intensity_normalization,
    inverse_intensity_normalization,
)


def _torch_depth_normalization(depth, min_d, max_d, alpha=0.75):
    """Reference semantics (ldm/data/utils.py:536-556), re-derived with
    torch masks for cross-checking our branch-free version."""
    out = torch.empty_like(depth)
    mid = (depth >= min_d) & (depth <= max_d)
    out[mid] = -alpha + 2 * alpha * (depth[mid] - min_d) / (max_d - min_d)
    low = (depth >= -1) & (depth < min_d)
    out[low] = -1 + -(alpha - 1) * (depth[low] + 1) / (min_d + 1)
    high = (depth > max_d) & (depth <= 1)
    out[high] = alpha + (1 - alpha) * (depth[high] - max_d) / (1 - max_d)
    return out


def test_depth_normalization_matches_masked_reference():
    rng = np.random.default_rng(0)
    depth = rng.uniform(-1, 1, size=(4, 32, 64)).astype(np.float64)
    min_d, max_d = -0.37, 0.12
    ours = depth_normalization(depth, min_d, max_d, alpha=0.75)
    ref = _torch_depth_normalization(
        torch.from_numpy(depth), torch.tensor(min_d), torch.tensor(max_d)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_depth_normalization_roundtrip():
    rng = np.random.default_rng(1)
    depth = rng.uniform(-1, 1, size=(1000,))
    for min_d, max_d in [(-0.8, -0.2), (-0.1, 0.9), (-0.99, 0.99)]:
        y = depth_normalization(depth, min_d, max_d, alpha=0.75)
        x = inverse_depth_normalization(y, min_d, max_d, alpha=0.75)
        np.testing.assert_allclose(x, depth, atol=1e-10)
        assert y.min() >= -1 - 1e-9 and y.max() <= 1 + 1e-9


def test_depth_normalization_window_mapping():
    # endpoints of the object window map to ±alpha
    y = depth_normalization(np.array([-0.3, 0.4]), -0.3, 0.4, alpha=0.75)
    np.testing.assert_allclose(y, [-0.75, 0.75], atol=1e-12)
    # full range endpoints are fixed points
    y = depth_normalization(np.array([-1.0, 1.0]), -0.3, 0.4, alpha=0.75)
    np.testing.assert_allclose(y, [-1.0, 1.0], atol=1e-12)


def test_depth_normalization_jax_matches_numpy():
    rng = np.random.default_rng(2)
    depth = rng.uniform(-1, 1, size=(32, 64)).astype(np.float32)
    a = depth_normalization(depth, -0.2, 0.6)
    b = depth_normalization(jnp.asarray(depth), -0.2, 0.6)
    np.testing.assert_allclose(np.asarray(b), a, atol=1e-6)


def test_intensity_matches_reference_composition():
    # reference (nuscenes.py:454-456): y = clamp(2*(1-exp(-2*(x+1))) - 1)
    x = torch.linspace(-1, 1, 101, dtype=torch.float64)
    ref = torch.clamp(2 * (1 - torch.exp(-2 * (x + 1))) - 1, -1, 1).numpy()
    ours = intensity_normalization(x.numpy())
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_intensity_roundtrip_and_reference_inverse():
    x = np.linspace(-1, 0.999, 200)
    y = intensity_normalization(x)
    back = inverse_intensity_normalization(y)
    np.testing.assert_allclose(back, x, atol=1e-9)
    # inverse formula identical to ddpm.py:1541
    t = torch.from_numpy(y)
    ref = torch.clamp(-0.5 * torch.log(1 - (t + 1) / 2) - 1, -1, 1).numpy()
    np.testing.assert_allclose(inverse_intensity_normalization(y), ref, atol=1e-9)

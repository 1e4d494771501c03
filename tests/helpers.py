"""Shared test helpers."""
import jax
import jax.numpy as jnp
import numpy as np


def perturb_params(params, keep_zero=(), scale=0.02, seed=42):
    """Move params off the zero-init point.

    Every ResBlock/SpatialTransformer output conv and the UNet's final conv
    are zero-initialized (reference zero_module design, openaimodel.py:833-837,
    attention.py:68-74), so AT init the eps output is exactly zero and no
    gradient flows to anything but the out conv. Real runs start from
    pretrained (non-zero) weights; tests that exercise gradient flow or
    t/context sensitivity must perturb off init first. Leaves whose path
    matches a `keep_zero` substring stay untouched.
    """
    rng = np.random.default_rng(seed)

    def bump(path, x):
        name = jax.tree_util.keystr(path)
        if any(k in name for k in keep_zero):
            return x
        return x + scale * jnp.asarray(rng.standard_normal(x.shape), dtype=x.dtype)

    return jax.tree_util.tree_map_with_path(bump, params)

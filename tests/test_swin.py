"""Swin-T backbone + GeneralizedLSSFPN: shapes, window invariances, FPN."""
import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.models.swin import (
    GeneralizedLSSFPN,
    SwinTransformerTPU,
    _rel_pos_index,
    _shift_mask,
    _window_partition,
    _window_reverse,
)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 14 * 21 * 3, dtype=jnp.float32).reshape(2, 14, 21, 3)
    w = 7
    win = _window_partition(x, w)
    assert win.shape == (2 * 2 * 3, 49, 3)
    back = _window_reverse(win, w, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_rel_pos_index_properties():
    idx = _rel_pos_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # symmetric pairs map to mirrored offsets: diag is the zero offset
    assert len(set(np.diag(idx))) == 1


def test_shift_mask_blocks_cross_region():
    m = _shift_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert m.min() == -100.0 and m.max() == 0.0
    # the window with no region boundary (top-left) is fully unmasked
    assert np.all(m[0] == 0)


def test_swin_tiny_feature_pyramid():
    swin = SwinTransformerTPU(embed_dim=24, depths=(1, 1, 2, 1),
                              heads=(2, 2, 4, 4))
    x = jnp.ones((2, 64, 96, 3))
    params = swin.init(jax.random.PRNGKey(0), x)
    outs = swin.apply(params, x)
    # out_indices (1,2,3): strides 8/16/32, dims 2C/4C/8C
    assert outs[0].shape == (2, 8, 12, 48)
    assert outs[1].shape == (2, 4, 6, 96)
    assert outs[2].shape == (2, 2, 3, 192)
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_swin_nondivisible_input_pads():
    swin = SwinTransformerTPU(embed_dim=16, depths=(1, 1), heads=(2, 2),
                              out_indices=(0, 1))
    x = jnp.ones((1, 36, 44, 3))  # 9x11 patches, not divisible by 7
    params = swin.init(jax.random.PRNGKey(0), x)
    outs = swin.apply(params, x)
    assert outs[0].shape == (1, 9, 11, 16)
    assert outs[1].shape == (1, 5, 6, 32)


def test_generalized_lss_fpn():
    ins = [
        jnp.ones((2, 16, 22, 48)),
        jnp.ones((2, 8, 11, 96)),
        jnp.ones((2, 4, 6, 192)),
    ]
    neck = GeneralizedLSSFPN(out_channels=64)
    params = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(params, ins)
    assert len(outs) == 2
    assert outs[0].shape == (2, 16, 22, 64)
    assert outs[1].shape == (2, 8, 11, 64)

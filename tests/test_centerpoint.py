"""CenterPoint head: forward shapes, decode, loss gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.models.centerpoint import (
    CenterHeadTPU,
    centerpoint_loss,
)
from mobi_tpu.models.transfusion_loss import TransFusionLossConfig

CFG = TransFusionLossConfig(num_classes=3)


def _head():
    return CenterHeadTPU(num_classes=3, share_conv_channel=8,
                         max_detections=16)


def test_forward_and_decode_shapes():
    head = _head()
    bev = jnp.zeros((2, 16, 16, 12))
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    assert preds["heatmap"].shape == (2, 16, 16, 3)
    assert preds["reg"].shape == (2, 16, 16, 2)
    assert preds["dim"].shape == (2, 16, 16, 3)
    det = head.decode(preds)
    assert det["bboxes"].shape == (2, 16, 9)
    assert det["scores"].shape == (2, 16)
    assert det["labels"].shape == (2, 16)


def test_decode_recovers_planted_peak():
    head = _head()
    B, H, W = 1, 32, 32
    preds = {
        "heatmap": jnp.full((B, H, W, 3), -8.0).at[0, 10, 20, 1].set(8.0),
        "reg": jnp.zeros((B, H, W, 2)),
        "height": jnp.full((B, H, W, 1), 1.0),
        "dim": jnp.zeros((B, H, W, 3)),
        "rot": jnp.zeros((B, H, W, 2)).at[..., 1].set(1.0),
        "vel": jnp.zeros((B, H, W, 2)),
    }
    det = head.decode(preds)
    assert int(det["labels"][0, 0]) == 1
    step = head.out_size_factor * head.voxel_size[0]
    np.testing.assert_allclose(
        float(det["bboxes"][0, 0, 0]), 20 * step + head.pc_range[0], atol=1e-4
    )
    np.testing.assert_allclose(float(det["bboxes"][0, 0, 6]), 0.0, atol=1e-5)
    assert bool(det["keep"][0, 0])


def test_centerpoint_loss_grad():
    B, H, W = 1, 180, 180
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    preds = {
        "heatmap": jax.random.normal(ks[0], (B, H, W, 3)),
        "reg": jax.random.normal(ks[1], (B, H, W, 2)) * 0.1,
        "height": jax.random.normal(ks[2], (B, H, W, 1)),
        "dim": jax.random.normal(ks[3], (B, H, W, 3)) * 0.1,
        "rot": jax.random.normal(ks[4], (B, H, W, 2)),
        "vel": jax.random.normal(ks[5], (B, H, W, 2)) * 0.1,
    }
    boxes = jnp.zeros((1, 4, 9)).at[0, 0].set(
        jnp.asarray([5.0, 3.0, -1.0, 4.0, 2.0, 1.5, 0.3, 1.0, 0.0])
    )
    labels = jnp.zeros((1, 4), jnp.int32)
    mask = jnp.zeros((1, 4), bool).at[0, 0].set(True)
    total, metrics = centerpoint_loss(preds, boxes, labels, mask, CFG)
    assert np.isfinite(float(total))
    assert int(metrics["num_pos"]) == 1

    grads = jax.grad(
        lambda p: centerpoint_loss(p, boxes, labels, mask, CFG)[0]
    )(preds)
    assert float(jnp.abs(grads["reg"]).sum()) > 0
    assert float(jnp.abs(grads["heatmap"]).sum()) > 0

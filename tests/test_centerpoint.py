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


def test_centerpoint_decode_golden_vs_reference_coder():
    """CenterHeadTPU.decode vs the reference's CenterPointBBoxCoder
    (core/bbox/coders/centerpoint_bbox_coders.py:8-200) on isolated peaks:
    x/y/dim/yaw/vel/score/label parity; our z is the bottom-center
    (z_ref - dim_z/2, the get_bboxes LiDARInstance3DBoxes conversion)."""
    import sys as _sys
    import os as _os

    _sys.path.insert(0, _os.path.dirname(__file__))
    import mm_stubs
    import pytest

    torch = pytest.importorskip("torch")
    coder_mod = mm_stubs.load_ref(
        "mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py",
        "ref_centerpoint_coder",
    )

    H = W = 32
    C = 3
    rng = np.random.default_rng(21)
    heat_logits = np.full((1, H, W, C), -6.0, np.float32)
    peaks = [(5, 7, 0, 2.0), (20, 11, 1, 1.5), (9, 28, 2, 1.0)]
    for (y, x, c, v) in peaks:
        heat_logits[0, y, x, c] = v
    preds = {
        "heatmap": jnp.asarray(heat_logits),
        "reg": jnp.asarray(rng.uniform(0, 1, (1, H, W, 2)).astype(np.float32)),
        "height": jnp.asarray(
            rng.normal(0, 0.5, (1, H, W, 1)).astype(np.float32)),
        "dim": jnp.asarray(
            rng.normal(0, 0.2, (1, H, W, 3)).astype(np.float32)),
        "rot": jnp.asarray(rng.normal(0, 1, (1, H, W, 2)).astype(np.float32)),
        "vel": jnp.asarray(
            rng.normal(0, 1, (1, H, W, 2)).astype(np.float32)),
    }
    head = CenterHeadTPU(num_classes=C, max_detections=8)
    ours = jax.tree.map(np.asarray, head.decode(preds, score_threshold=0.5))

    coder = coder_mod.CenterPointBBoxCoder(
        pc_range=list(head.pc_range), out_size_factor=head.out_size_factor,
        voxel_size=list(head.voxel_size), max_num=8,
        post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    )

    def nchw(name, ch=None):
        # the reference coder's spatial convention is [B, C, W, H] with the
        # x index FIRST (docstring centerpoint_bbox_coders.py:126): its
        # xs = flat_ind // last_dim. Our decode reads NHWC with row = y,
        # col = x, so our col axis maps to the coder's dim 2.
        a = np.ascontiguousarray(np.asarray(preds[name]).transpose(0, 3, 2, 1))
        return torch.from_numpy(a if ch is None else a[:, ch:ch + 1].copy())

    with torch.no_grad():
        ref = coder.decode(
            torch.sigmoid(nchw("heatmap")),
            nchw("rot", 0), nchw("rot", 1),
            nchw("height"),
            torch.exp(nchw("dim").float()),
            nchw("vel"),
            reg=nchw("reg"),
        )
    ref_boxes = ref[0]["bboxes"].numpy()
    ref_scores = ref[0]["scores"].numpy()
    ref_labels = ref[0]["labels"].numpy()

    # the 3 isolated peaks are the top-3 on both sides (all other cells
    # sit at sigmoid(-6)); compare them in score order
    for i in range(3):
        assert ours["scores"][0, i] == pytest.approx(ref_scores[i], abs=1e-5)
        assert int(ours["labels"][0, i]) == int(ref_labels[i])
        b_o, b_r = ours["bboxes"][0, i], ref_boxes[i]
        np.testing.assert_allclose(b_o[:2], b_r[:2], atol=1e-4)   # x, y
        np.testing.assert_allclose(
            b_o[2], b_r[2] - b_r[5] / 2, atol=1e-4)               # bottom z
        np.testing.assert_allclose(b_o[3:6], b_r[3:6], atol=1e-4)  # dims
        np.testing.assert_allclose(
            np.angle(np.exp(1j * (b_o[6] - b_r[6]))), 0.0, atol=1e-4)
        np.testing.assert_allclose(b_o[7:9], b_r[7:9], atol=1e-4)  # vel

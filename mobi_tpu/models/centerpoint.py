"""CenterPoint-style detection head (the reference's second head family).

Equivalent of /root/reference/bevfusion/mmdet3d/models/heads/bbox/
centerpoint.py (SeparateHead :20-128, CenterHead :249-846): dense per-class
heatmaps plus per-cell regression maps, decoded by top-K peak picking —
no transformer decoder (contrast TransFusionHeadTPU). Multi-task grouping
collapses to a single task over all classes here (the shipped BEVFusion
config uses one task of 10 classes).

TPU design: everything is dense NHWC convs + one static `top_k`; training
targets reuse the gaussian heatmap drawing of transfusion_loss, and the
regression target is scattered per GT into the flattened feature map with
`.at[].set` — no dynamic shapes anywhere.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mobi_tpu.models.transfusion_loss import (
    TransFusionLossConfig,
    draw_heatmap_targets,
    gaussian_focal_loss,
)

Array = jnp.ndarray


class SeparateHead(nn.Module):
    """Per-quantity conv branches over a shared BEV feature
    (centerpoint.py:20-128). heads: name -> (out_channels, num_convs)."""

    heads: Dict[str, Tuple[int, int]]
    head_conv: int = 64
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        out = {}
        for name, (out_ch, num_conv) in self.heads.items():
            h = x
            for i in range(num_conv - 1):
                h = nn.Conv(
                    self.head_conv, (3, 3), padding=((1, 1), (1, 1)),
                    param_dtype=jnp.float32, name=f"{name}_conv{i}",
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "heatmap" else nn.initializers.zeros
            )
            out[name] = nn.Conv(
                out_ch, (3, 3), padding=((1, 1), (1, 1)),
                bias_init=bias_init, param_dtype=jnp.float32,
                name=f"{name}_out",
            )(h)
        return out


class CenterHeadTPU(nn.Module):
    """Single-task CenterHead (centerpoint.py:249-846)."""

    num_classes: int = 10
    in_channels: int = 512
    share_conv_channel: int = 64
    max_detections: int = 500
    out_size_factor: int = 8
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    pc_range: Tuple[float, float] = (-54.0, -54.0)

    @nn.compact
    def __call__(self, bev: Array) -> Dict[str, Array]:
        h = nn.Conv(
            self.share_conv_channel, (3, 3), padding=((1, 1), (1, 1)),
            param_dtype=jnp.float32, name="shared_conv",
        )(bev)
        h = nn.relu(h)
        return SeparateHead(
            heads={
                "heatmap": (self.num_classes, 2),
                "reg": (2, 2),
                "height": (1, 2),
                "dim": (3, 2),
                "rot": (2, 2),
                "vel": (2, 2),
            },
            name="task_head",
        )(h)

    def decode(
        self, preds: Dict[str, Array], score_threshold: float = 0.1,
        nms_kernel: int = 3,
    ) -> Dict[str, Array]:
        """Peak-pick top-K boxes (CenterHead.get_bboxes + bbox_coder): local
        max filter on the sigmoid heatmap, static top-K over (class, cell),
        gather the per-cell regressions, decode to metric boxes."""
        hm = jax.nn.sigmoid(preds["heatmap"])  # [B, H, W, C]
        B, H, W, C = hm.shape
        pad = nms_kernel // 2
        local = jax.lax.reduce_window(
            hm, -jnp.inf, jax.lax.max,
            (1, nms_kernel, nms_kernel, 1), (1, 1, 1, 1), "SAME",
        )
        peaks = hm * (hm == local)
        flat = peaks.transpose(0, 3, 1, 2).reshape(B, -1)
        scores, top = jax.lax.top_k(flat, self.max_detections)
        hw = H * W
        cls = top // hw
        idx = top % hw
        ys = (idx // W).astype(jnp.float32)
        xs = (idx % W).astype(jnp.float32)

        def gather(name):
            t = preds[name].reshape(B, hw, -1)
            return jnp.take_along_axis(t, idx[..., None], axis=1)

        reg = gather("reg")
        xs = xs + reg[..., 0]
        ys = ys + reg[..., 1]
        cx = xs * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        cy = ys * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        dim = jnp.exp(gather("dim"))
        rot = gather("rot")
        yaw = jnp.arctan2(rot[..., 0], rot[..., 1])
        z = gather("height")[..., 0] - dim[..., 2] * 0.5
        boxes = jnp.concatenate(
            [jnp.stack([cx, cy, z], -1), dim, yaw[..., None], gather("vel")],
            axis=-1,
        )
        return {
            "bboxes": boxes,
            "scores": scores,
            "labels": cls,
            "keep": scores > score_threshold,
        }


def centerpoint_loss(
    preds: Dict[str, Array],
    gt_boxes: Array,   # [B, G, 9]
    gt_labels: Array,  # [B, G]
    gt_mask: Array,    # [B, G]
    cfg: TransFusionLossConfig = TransFusionLossConfig(),
    code_weights: Sequence[float] = (1.0,) * 8 + (0.2, 0.2),
) -> Tuple[Array, Dict[str, Array]]:
    """CenterHead.loss (centerpoint.py:585-636): gaussian-focal heatmap loss
    + L1 regression at each GT's center cell. Static shapes via the padded
    GT arrays; invalid GTs carry zero weight."""
    B, H, W, C = preds["heatmap"].shape
    G = gt_boxes.shape[1]
    step_x = cfg.voxel_size[0] * cfg.out_size_factor
    step_y = cfg.voxel_size[1] * cfg.out_size_factor

    hm_target = jax.vmap(
        lambda b, l, m: draw_heatmap_targets(b, l, m, cfg, H, W)
    )(gt_boxes, gt_labels, gt_mask)  # [B, C, H, W]
    hm_pred = jnp.clip(
        jax.nn.sigmoid(preds["heatmap"]), 1e-4, 1 - 1e-4
    ).transpose(0, 3, 1, 2)
    n_peaks = jnp.maximum((hm_target == 1.0).sum(), 1).astype(jnp.float32)
    loss_hm = gaussian_focal_loss(hm_pred, hm_target) / n_peaks

    # regression targets at the (floored) center cells
    fx = (gt_boxes[..., 0] - cfg.pc_range[0]) / step_x
    fy = (gt_boxes[..., 1] - cfg.pc_range[1]) / step_y
    ix = jnp.clip(jnp.floor(fx), 0, W - 1)
    iy = jnp.clip(jnp.floor(fy), 0, H - 1)
    cell = (iy * W + ix).astype(jnp.int32)  # [B, G]
    target = jnp.concatenate(
        [
            (fx - ix)[..., None], (fy - iy)[..., None],
            (gt_boxes[..., 2] + gt_boxes[..., 5] * 0.5)[..., None],
            jnp.log(jnp.maximum(gt_boxes[..., 3:6], 1e-6)),
            jnp.sin(gt_boxes[..., 6])[..., None],
            jnp.cos(gt_boxes[..., 6])[..., None],
            gt_boxes[..., 7:9],
        ],
        axis=-1,
    )  # [B, G, 10]
    pred_maps = jnp.concatenate(
        [preds["reg"], preds["height"], preds["dim"], preds["rot"],
         preds["vel"]],
        axis=-1,
    ).reshape(B, H * W, -1)  # [B, HW, 10]
    pred_at_gt = jnp.take_along_axis(pred_maps, cell[..., None], axis=1)
    cw = jnp.asarray(code_weights)
    l1 = jnp.abs(pred_at_gt - target) * cw * gt_mask[..., None]
    num_pos = jnp.maximum(gt_mask.sum(), 1).astype(jnp.float32)
    loss_bbox = l1.sum() / (num_pos * 10.0) * 0.25

    total = loss_hm + loss_bbox
    return total, {
        "loss": total,
        "loss_heatmap": loss_hm,
        "loss_bbox": loss_bbox,
        "num_pos": gt_mask.sum().astype(jnp.float32),
    }

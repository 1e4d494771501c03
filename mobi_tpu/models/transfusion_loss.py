"""TransFusion head training losses: Hungarian matching + focal/L1.

Equivalent of the reference training path in
/root/reference/bevfusion/mmdet3d/models/heads/bbox/transfusion.py
(get_targets_single :408-586, loss :588-714), the HungarianAssigner3D and
its costs (/root/reference/bevfusion/mmdet3d/core/bbox/assigners/
hungarian_assigner.py:14-142), and the TransFusionBBoxCoder.encode
(coders/transfusion_bbox_coder.py:24-37). Loss/cost weights default to the
shipped nuScenes config (configs/nuscenes/det/transfusion/default.yaml).

TPU design:
  * All target tensors are static-shape: GT boxes arrive padded to `max_gt`
    with a validity mask; cost rows/columns for invalid GTs are masked.
  * The Hungarian assignment runs ON DEVICE (`_lapjv_device`, the same
    shortest-augmenting-path algorithm scipy uses) — the reference moves
    the cost matrix to the CPU for scipy (hungarian_assigner.py:122-127),
    but a host round-trip inside the train step stalls the pipeline and
    host callbacks are unsupported on some TPU runtimes; at [max_gt,
    num_proposals] size the on-device solve is negligible.
  * Dense heatmap targets are drawn with one fused `[G, H, W]` gaussian
    evaluation + a scatter-max over classes — no per-object python loop.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mobi_tpu.ops.box3d import iou_3d

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TransFusionLossConfig:
    num_classes: int = 10
    num_proposals: int = 200
    pc_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    out_size_factor: int = 8
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    code_weights: Tuple[float, ...] = (
        1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2
    )
    cls_cost_weight: float = 0.15
    reg_cost_weight: float = 0.25
    iou_cost_weight: float = 0.25
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 0.25
    loss_heatmap_weight: float = 1.0


def gaussian_radius(dims_feat: Array, min_overlap: float) -> Array:
    """CenterNet gaussian radius for [.., 2] (length, width) in feature
    cells (mmdet3d.core.utils.gaussian_radius)."""
    length, width = dims_feat[..., 0], dims_feat[..., 1]

    a1 = 1.0
    b1 = length + width
    c1 = width * length * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (length + width)
    c2 = (1 - min_overlap) * width * length
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (length + width)
    c3 = (min_overlap - 1) * width * length
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_heatmap_targets(
    gt_boxes: Array,  # [G, >=7] (x, y, z_bottom, dx, dy, dz, yaw, ...)
    gt_labels: Array,  # [G]
    gt_mask: Array,  # [G] bool
    cfg: TransFusionLossConfig,
    feat_h: int,
    feat_w: int,
) -> Array:
    """[C, H, W] gaussian heatmap targets (get_targets_single :527-586)."""
    step_x = cfg.voxel_size[0] * cfg.out_size_factor
    step_y = cfg.voxel_size[1] * cfg.out_size_factor
    w_feat = gt_boxes[:, 3] / step_x
    l_feat = gt_boxes[:, 4] / step_y
    radius = gaussian_radius(
        jnp.stack([l_feat, w_feat], -1), cfg.gaussian_overlap
    )
    radius = jnp.maximum(jnp.floor(radius), float(cfg.min_radius))
    valid = gt_mask & (w_feat > 0) & (l_feat > 0)

    cx = (gt_boxes[:, 0] - cfg.pc_range[0]) / step_x
    cy = (gt_boxes[:, 1] - cfg.pc_range[1]) / step_y
    # integer center like draw_heatmap_gaussian's int coords
    cx = jnp.floor(cx)
    cy = jnp.floor(cy)

    ys = jnp.arange(feat_h, dtype=jnp.float32)
    xs = jnp.arange(feat_w, dtype=jnp.float32)
    dy = ys[None, :, None] - cy[:, None, None]  # [G, H, 1]
    dx = xs[None, None, :] - cx[:, None, None]  # [G, 1, W]
    sigma = (2 * radius + 1) / 6.0
    gauss = jnp.exp(
        -(dx**2 + dy**2) / (2 * sigma[:, None, None] ** 2)
    )  # [G, H, W]
    # zero out beyond the radius box (draw_heatmap_gaussian masks to the
    # [2r+1, 2r+1] window) and invalid gts
    inside = (jnp.abs(dx) <= radius[:, None, None]) & (
        jnp.abs(dy) <= radius[:, None, None]
    )
    gauss = jnp.where(inside & valid[:, None, None], gauss, 0.0)
    heatmap = jnp.zeros((cfg.num_classes, feat_h, feat_w))
    return heatmap.at[jnp.clip(gt_labels, 0, cfg.num_classes - 1)].max(gauss)


def _host_hungarian(cost: np.ndarray) -> np.ndarray:
    """cost [P, G] -> matched gt index per proposal (-1 = unmatched).
    scipy oracle kept for cross-checking the device solver in tests."""
    from scipy.optimize import linear_sum_assignment

    out = np.full(cost.shape[0], -1, np.int32)
    rows, cols = linear_sum_assignment(cost)
    out[rows] = cols.astype(np.int32)
    return out


def _lapjv_device(cost: Array) -> Array:
    """Optimal rectangular assignment ON DEVICE: shortest-augmenting-path
    (Jonker-Volgenant, the same algorithm scipy's linear_sum_assignment
    uses) expressed with lax loops over static shapes.

    cost: [R, C] with R <= C; every row gets a distinct column; returns
    col4row [R] int32. The reference solves this on the CPU via scipy
    (hungarian_assigner.py:122-127); a host round-trip per train step is
    both a pipeline stall and unsupported on some TPU runtimes, and at
    R = max_gt (~32), C = num_proposals (~200) the whole solve is ~R^2
    sequential steps of C-wide vector work — negligible next to the
    network, so it lives in the step graph.
    """
    R, C = cost.shape
    cost = cost.astype(jnp.float32)
    INF = jnp.float32(jnp.inf)

    def solve_row(cur_row, state):
        u, v, row4col, col4row = state

        def dijkstra(dstate):
            i, minval, shortest, pred, SC, SR, _sink = dstate
            SR = SR.at[i].set(True)
            r = minval + cost[i] - u[i] - v  # [C] path costs via row i
            upd = (r < shortest) & ~SC
            shortest = jnp.where(upd, r, shortest)
            pred = jnp.where(upd, i, pred)
            # next col: min shortest among unscanned; ties prefer an
            # unassigned col (scipy's `<= lowest && row4col[j] == -1`)
            masked = jnp.where(SC, INF, shortest)
            base = jnp.min(masked)
            free = masked <= base  # ties at the minimum
            unassigned = free & (row4col == -1)
            j = jnp.where(
                jnp.any(unassigned),
                jnp.argmax(unassigned),
                jnp.argmin(masked),
            )
            SC = SC.at[j].set(True)
            sink = jnp.where(row4col[j] == -1, j, -1)
            i_next = jnp.where(row4col[j] == -1, i, row4col[j])
            return i_next, masked[j], shortest, pred, SC, SR, sink

        init = (
            cur_row, jnp.float32(0.0), jnp.full((C,), INF),
            jnp.full((C,), cur_row, jnp.int32),
            jnp.zeros((C,), bool), jnp.zeros((R,), bool), jnp.int32(-1),
        )
        _, minval, shortest, pred, SC, SR, sink = jax.lax.while_loop(
            lambda s: s[-1] == -1, dijkstra, init
        )

        # dual updates (scipy _lsap.c): scanned rows/cols shift by the
        # slack between minval and their shortest-path cost
        u = u.at[cur_row].add(minval)
        safe_cols = jnp.clip(col4row, 0, C - 1)
        row_shift = minval - shortest[safe_cols]  # [R]
        u = jnp.where(SR & (jnp.arange(R) != cur_row), u + row_shift, u)
        v = jnp.where(SC, v - (minval - shortest), v)

        # augment: walk predecessors back from the sink
        def backtrack(bstate):
            j, row4col, col4row, _done = bstate
            i = pred[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return j_next, row4col, col4row, i == cur_row

        _, row4col, col4row, _ = jax.lax.while_loop(
            lambda s: ~s[-1], backtrack, (sink, row4col, col4row, False)
        )
        return u, v, row4col, col4row

    state = (
        jnp.zeros((R,), jnp.float32), jnp.zeros((C,), jnp.float32),
        jnp.full((C,), -1, jnp.int32), jnp.full((R,), -1, jnp.int32),
    )
    _, _, _, col4row = jax.lax.fori_loop(0, R, solve_row, state)
    return col4row


def hungarian_assign(cost: Array) -> Array:
    """Jit-safe optimal Hungarian matching, fully on device. cost: [P, G]
    (P proposals >= G gt columns); returns [P] matched gt index or -1.

    Solves the transposed [G, P] problem (assign every gt a distinct
    proposal, scipy column semantics) with `_lapjv_device` and scatters
    back to per-proposal indices."""
    P, G = cost.shape
    if G > P:
        # _lapjv_device's augmenting-path search requires rows <= columns;
        # with more gts than proposals the jitted while_loop could never
        # terminate (no unassigned sink exists once all P columns are
        # taken) — fail loudly at trace time instead of hanging the chip.
        raise ValueError(
            f"hungarian_assign needs proposals >= gt columns, got P={P} < "
            f"G={G}; raise num_proposals or lower max_gt"
        )
    col4row = _lapjv_device(cost.T)  # [G] proposal per gt
    return (
        jnp.full((P,), -1, jnp.int32)
        .at[col4row]
        .set(jnp.arange(G, dtype=jnp.int32), mode="drop")
    )


def encode_gt_boxes(gt_boxes: Array, cfg: TransFusionLossConfig) -> Array:
    """[..., 9] metric boxes -> [..., 10] regression codes
    (transfusion_bbox_coder.py:24-37)."""
    step_x = cfg.voxel_size[0] * cfg.out_size_factor
    step_y = cfg.voxel_size[1] * cfg.out_size_factor
    eps = 1e-6
    return jnp.concatenate(
        [
            ((gt_boxes[..., 0] - cfg.pc_range[0]) / step_x)[..., None],
            ((gt_boxes[..., 1] - cfg.pc_range[1]) / step_y)[..., None],
            (gt_boxes[..., 2] + gt_boxes[..., 5] * 0.5)[..., None],  # bottom->gravity
            jnp.log(jnp.maximum(gt_boxes[..., 3:6], eps)),
            jnp.sin(gt_boxes[..., 6])[..., None],
            jnp.cos(gt_boxes[..., 6])[..., None],
            gt_boxes[..., 7:9],
        ],
        axis=-1,
    )


def _decode_pred_boxes(preds: Dict[str, Array], cfg: TransFusionLossConfig) -> Array:
    """Detached predictions -> metric [B, P, 9] boxes for matching
    (get_targets_single :427-440)."""
    center = jax.lax.stop_gradient(preds["center"])
    height = jax.lax.stop_gradient(preds["height"])
    dim = jnp.exp(jax.lax.stop_gradient(preds["dim"]))
    rot = jax.lax.stop_gradient(preds["rot"])
    vel = jax.lax.stop_gradient(preds["vel"])
    cx = center[..., 0] * cfg.out_size_factor * cfg.voxel_size[0] + cfg.pc_range[0]
    cy = center[..., 1] * cfg.out_size_factor * cfg.voxel_size[1] + cfg.pc_range[1]
    z = height[..., 0] - dim[..., 2] * 0.5
    yaw = jnp.arctan2(rot[..., 0], rot[..., 1])
    return jnp.concatenate(
        [jnp.stack([cx, cy, z], -1), dim, yaw[..., None], vel], axis=-1
    )


def _focal_cls_cost(scores: Array, gt_labels: Array, cfg) -> Array:
    """mmdet FocalLossCost: [P, C] raw logits-after-sigmoid scores vs [G]
    labels -> [P, G]."""
    eps = 1e-12
    p = scores
    pos = -jnp.log(p + eps) * cfg.focal_alpha * (1 - p) ** cfg.focal_gamma
    neg = -jnp.log(1 - p + eps) * (1 - cfg.focal_alpha) * p**cfg.focal_gamma
    return (pos - neg)[:, gt_labels] * cfg.cls_cost_weight


def _sigmoid_focal_loss(logits: Array, targets: Array, cfg) -> Array:
    """Elementwise sigmoid focal loss (mmdet FocalLoss, use_sigmoid)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = cfg.focal_alpha * targets + (1 - cfg.focal_alpha) * (1 - targets)
    return alpha_t * ((1 - p_t) ** cfg.focal_gamma) * ce


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    zeros = jnp.zeros_like(logits)
    return (
        jnp.maximum(logits, zeros) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gaussian_focal_loss(pred_sig: Array, target: Array) -> Array:
    """Penalty-reduced CenterNet focal (mmdet GaussianFocalLoss), summed."""
    eps = 1e-12
    pos_w = (target == 1.0).astype(pred_sig.dtype)
    neg_w = (1 - target) ** 4
    pos = -jnp.log(pred_sig + eps) * (1 - pred_sig) ** 2 * pos_w
    neg = -jnp.log(1 - pred_sig + eps) * pred_sig**2 * neg_w * (1 - pos_w)
    return (pos + neg).sum()


def transfusion_loss(
    preds: Dict[str, Array],
    gt_boxes: Array,  # [B, G, 9] (x, y, z_bottom, dx, dy, dz, yaw, vx, vy)
    gt_labels: Array,  # [B, G]
    gt_mask: Array,  # [B, G] bool
    cfg: TransFusionLossConfig = TransFusionLossConfig(),
) -> Tuple[Array, Dict[str, Array]]:
    """Full TransFusion training loss for one forward pass of
    TransFusionHeadTPU (loss :588-714). Returns (total, metrics)."""
    B, P, C = preds["heatmap"].shape
    G = gt_boxes.shape[1]
    feat_h, feat_w = preds["dense_heatmap"].shape[1:3]

    pred_boxes = _decode_pred_boxes(preds, cfg)  # [B, P, 9]
    cls_scores = jax.lax.stop_gradient(jax.nn.sigmoid(preds["heatmap"]))

    pc_lo = jnp.asarray(cfg.pc_range[0:2])
    pc_span = jnp.asarray(cfg.pc_range[3:5]) - pc_lo

    def assign_one(boxes_p, scores_p, boxes_g, labels_g, mask_g):
        # costs (hungarian_assigner.py:112-120)
        cls_cost = _focal_cls_cost(scores_p, labels_g, cfg)  # [P, G]
        nb = (boxes_p[:, :2] - pc_lo) / pc_span
        ng = (boxes_g[:, :2] - pc_lo) / pc_span
        reg_cost = jnp.abs(nb[:, None] - ng[None]).sum(-1) * cfg.reg_cost_weight
        iou = iou_3d(boxes_p[:, :7], boxes_g[:, :7])  # [P, G]
        iou_cost = -iou * cfg.iou_cost_weight
        cost = cls_cost + reg_cost + iou_cost
        # mask invalid gt columns with a big constant so scipy never picks
        # them over any valid column
        BIG = 1e6
        cost = jnp.where(mask_g[None, :], cost, BIG)
        match = hungarian_assign(cost)  # [P], gt idx or -1
        matched_valid = (match >= 0) & jnp.take(
            mask_g, jnp.clip(match, 0, G - 1)
        )
        return match, matched_valid, iou

    match, pos_mask, iou = jax.vmap(assign_one)(
        pred_boxes, cls_scores, gt_boxes, gt_labels, gt_mask
    )
    match_c = jnp.clip(match, 0, G - 1)

    # classification targets: matched label else background (=C)
    labels = jnp.where(
        pos_mask, jnp.take_along_axis(gt_labels, match_c, axis=1), C
    )  # [B, P]
    one_hot = jax.nn.one_hot(labels, C)  # background row -> all zeros
    num_pos = jnp.maximum(pos_mask.sum(), 1).astype(jnp.float32)

    loss_cls = (
        _sigmoid_focal_loss(preds["heatmap"], one_hot, cfg).sum() / num_pos
    ) * cfg.loss_cls_weight

    # bbox regression on matched proposals
    pred_code = jnp.concatenate(
        [
            preds["center"], preds["height"], preds["dim"], preds["rot"],
            preds["vel"],
        ],
        axis=-1,
    )  # [B, P, 10]
    gt_code = encode_gt_boxes(gt_boxes, cfg)  # [B, G, 10]
    tgt_code = jnp.take_along_axis(
        gt_code, match_c[..., None], axis=1
    )  # [B, P, 10]
    cw = jnp.asarray(cfg.code_weights)
    l1 = jnp.abs(pred_code - tgt_code) * cw
    l1 = jnp.where(pos_mask[..., None], l1, 0.0)
    loss_bbox = (l1.sum() / (num_pos * 10.0)) * cfg.loss_bbox_weight

    # dense heatmap loss
    hm_target = jax.vmap(
        lambda b, l, m: draw_heatmap_targets(b, l, m, cfg, feat_h, feat_w)
    )(gt_boxes, gt_labels, gt_mask)  # [B, C, H, W]
    hm_pred = jnp.clip(
        jax.nn.sigmoid(preds["dense_heatmap"]), 1e-4, 1 - 1e-4
    ).transpose(0, 3, 1, 2)  # [B, C, H, W]
    n_peaks = jnp.maximum((hm_target == 1.0).sum(), 1).astype(jnp.float32)
    loss_heatmap = (
        gaussian_focal_loss(hm_pred, hm_target) / n_peaks
    ) * cfg.loss_heatmap_weight

    matched_iou = jnp.where(
        pos_mask, jnp.take_along_axis(iou, match_c[..., None], axis=2)[..., 0], 0.0
    )
    total = loss_cls + loss_bbox + loss_heatmap
    return total, {
        "loss": total,
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "loss_heatmap": loss_heatmap,
        "num_pos": pos_mask.sum().astype(jnp.float32),
        "matched_iou": matched_iou.sum() / num_pos,
    }

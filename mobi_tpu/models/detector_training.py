"""BEVFusion detector training: train state + jitted step over the
TransFusion loss.

Reference counterpart: /root/reference/bevfusion/tools/train.py (mmcv-runner
assembly) + mmdet3d/models/fusion_models/bevfusion.py:207-310 forward_single
training branch (returns head losses). Optimization recipe from
configs/nuscenes/default.yaml: AdamW lr 2e-4 wd 1e-2, grad clip 35,
cyclic/one-cycle schedule approximated with cosine warmup-decay.

The sparse-conv rulebooks are per-sample host artifacts with data-dependent
sizes; without padding the step would jit-compile per rulebook shape
signature. `prepare_lidar_inputs(static_caps=default_static_caps(...))`
pads plans and voxel features to fixed shapes so every cloud shares ONE
compiled program — mandatory on TPU, where each retrace is a trip through
the compile service.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mobi_tpu.models.bevfusion import BEVFusionDetector
from mobi_tpu.models.transfusion_loss import (
    TransFusionLossConfig,
    transfusion_loss,
)

Array = jnp.ndarray


def make_detector_optimizer(
    lr: float = 2e-4,
    weight_decay: float = 0.01,
    clip_norm: float = 35.0,
    total_steps: int = 0,
    warmup_steps: int = 500,
) -> optax.GradientTransformation:
    if total_steps > warmup_steps:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps
        )
    else:
        sched = lr
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def camera_batch_inputs(
    points_aug: np.ndarray,
    lidar_aug_matrix: np.ndarray,
    sample: Dict,
    rng: Optional[np.random.Generator] = None,
    image_aug: bool = False,
    grid_mask_prob: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Camera-branch training inputs for one sample.

    points_aug: the lidar-augmented training cloud (train_pipeline output);
    lidar_aug_matrix: the composed 4x4 lidar aug; sample: a
    DetectionSceneDataset item with resized images + folded matrices.

    The camera vtransform must place camera BEV features in the AUGMENTED
    lidar frame (where the gt boxes live), so the aug composes into
    cam2lidar; the sparse depth map projects through the UN-augmented
    geometry, so the aug is inverted off the points first (the reference
    passes lidar_aug_matrix into the vtransform and inverts it in
    vtransforms/base.py:241-258 — composing host-side is equivalent and
    keeps the device program aug-free).

    image_aug: apply the reference's RANDOM per-view ImageAug3D
    (resize/crop/flip/rotate, transforms_3d.py:31-128) on top of the
    sample's deterministic resize, folding each view's affine into the
    projection matrices the same way the eval loader folds its resize.
    grid_mask_prob: apply GridMask stripe occlusion to the augmented
    views (transforms_3d.py:164-251) with this probability."""
    from mobi_tpu.models.bevfusion import build_sparse_depth_map

    images = sample["images"].astype(np.float32)
    l2i = np.asarray(sample["lidar2image"], np.float32)
    intr = np.asarray(sample["camera_intrinsics"], np.float32)
    if image_aug and rng is not None:
        from mobi_tpu.data.det_pipeline import fold_img_aug, image_aug_3d

        fH, fW = images.shape[1:3]
        images, mats = image_aug_3d(
            images, rng, final_dim=(fH, fW), resize_lim=(0.9, 1.1),
            is_train=True,
        )
        l2i, intr = fold_img_aug(l2i, intr, mats)
    if grid_mask_prob > 0 and rng is not None:
        from mobi_tpu.data.det_pipeline import grid_mask

        images = grid_mask(images, rng, prob=grid_mask_prob)

    aug = np.asarray(lidar_aug_matrix, np.float64)
    inv = np.linalg.inv(aug)
    p0 = points_aug[:, :3] @ inv[:3, :3].T + inv[:3, 3]
    iH, iW = images.shape[1:3]
    return dict(
        images=images.astype(np.float32),
        depth_map=build_sparse_depth_map(
            p0.astype(np.float32), l2i.astype(np.float32), (iH, iW)
        ),
        cam2lidar=(aug[None] @ sample["camera2lidar"]).astype(np.float32),
        intrins=intr[:, :3, :3].astype(np.float32),
    )


def detector_loss_fn(
    detector: BEVFusionDetector,
    params,
    batch: Dict,
    out_shape: Tuple[int, int, int],
    loss_cfg: TransFusionLossConfig,
) -> Tuple[Array, Dict[str, Array]]:
    """One-sample loss: forward the detector, apply the TransFusion loss.

    batch keys: voxel_feats, plans, out_coords (lidar), plus gt_boxes
    [1, G, 9] / gt_labels [1, G] / gt_mask [1, G], and the camera inputs
    when detector.use_camera. `out_shape` is the (static) dense BEV grid
    shape — it sizes jnp.zeros inside the encoder, so it cannot ride
    through the traced batch tree.
    """
    preds = detector.apply(
        {"params": params},
        batch["voxel_feats"],
        batch["plans"],
        batch["out_coords"],
        out_shape,
        images=batch.get("images"),
        depth_map=batch.get("depth_map"),
        cam2lidar=batch.get("cam2lidar"),
        intrins=batch.get("intrins"),
    )
    return transfusion_loss(
        preds, batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
        loss_cfg,
    )


def make_detector_train_step(
    detector: BEVFusionDetector,
    tx: optax.GradientTransformation,
    loss_cfg: Optional[TransFusionLossConfig] = None,
) -> Callable:
    """Jitted step(params, opt_state, batch, out_shape). Rulebooks in
    batch["plans"] are pytree nodes (static n_in/n_out aux, index-array
    children); feed STATICALLY-SHAPED plans from
    `prepare_lidar_inputs(static_caps=...)` so successive clouds reuse one
    compiled program. out_shape is a hashable static argument."""
    cfg = loss_cfg or TransFusionLossConfig(
        num_classes=detector.num_classes,
        num_proposals=detector.num_proposals,
    )

    @partial(jax.jit, static_argnames=("out_shape",))
    def step(params, opt_state, batch, out_shape):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: detector_loss_fn(detector, p, batch, out_shape, cfg),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return step


def stack_detector_batches(samples):
    """Stack per-sample batch dicts (each as produced for the single-sample
    step, with static-cap plans) into one batched tree with a leading batch
    axis on every leaf. Requires identical static caps across samples so
    every Rulebook's (n_in, n_out) aux matches — `prepare_lidar_inputs(
    static_caps=...)` guarantees that."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *samples)


def make_batched_detector_train_step(
    detector: BEVFusionDetector,
    tx: optax.GradientTransformation,
    loss_cfg: Optional[TransFusionLossConfig] = None,
    mesh=None,
    dp_axis: str = "dp",
) -> Callable:
    """step(params, opt_state, batch, out_shape) over a BATCH of samples
    (leading axis on every leaf, from `stack_detector_batches`): the
    detector forward is vmapped per sample — static-cap rulebooks make all
    per-sample plans shape-identical, so one compiled program serves any
    batch — and the mean loss is differentiated once.

    The reference reaches multi-GPU detector training via torchpack
    dist-run + DDP (bevfusion/tools/train.py); here the same thing is a
    sharding annotation: pass a `jax.sharding.Mesh` with a `dp` axis and
    the batch is sharded over it (params/opt state replicated, gradient
    all-reduce inserted by XLA)."""
    cfg = loss_cfg or TransFusionLossConfig(
        num_classes=detector.num_classes,
        num_proposals=detector.num_proposals,
    )

    def sample_loss(params, sample, out_shape):
        preds = detector.apply(
            {"params": params},
            sample["voxel_feats"], sample["plans"], sample["out_coords"],
            out_shape,
            images=sample.get("images"),
            depth_map=sample.get("depth_map"),
            cam2lidar=sample.get("cam2lidar"),
            intrins=sample.get("intrins"),
        )
        return transfusion_loss(
            preds, sample["gt_boxes"], sample["gt_labels"],
            sample["gt_mask"], cfg,
        )

    def loss_fn(params, batch, out_shape):
        totals, metrics = jax.vmap(
            lambda s: sample_loss(params, s, out_shape)
        )(batch)
        return totals.mean(), jax.tree.map(jnp.mean, metrics)

    @partial(jax.jit, static_argnames=("out_shape",))
    def step(params, opt_state, batch, out_shape):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P(dp_axis))
            )
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, out_shape)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return step


def pad_gt(
    boxes: np.ndarray, labels: np.ndarray, max_gt: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad per-sample GT to a fixed [max_gt] so the jitted loss sees static
    shapes. Boxes are padded to 9 columns (zero velocity)."""
    g = min(len(boxes), max_gt)
    out_b = np.zeros((max_gt, 9), np.float32)
    out_l = np.zeros((max_gt,), np.int32)
    out_m = np.zeros((max_gt,), bool)
    if g:
        b = boxes[:g]
        if b.shape[1] < 9:
            b = np.concatenate(
                [b, np.zeros((g, 9 - b.shape[1]), np.float32)], 1
            )
        out_b[:g] = b[:, :9]
        out_l[:g] = labels[:g]
        out_m[:g] = True
    return out_b, out_l, out_m

"""Detector training pipeline: multi-sweep loading, 3D augmentations, and
GT-database paste sampling (host-side numpy).

Equivalents of the reference mmdet3d pipeline stages consumed by the
BEVFusion detector configs (/root/reference/bevfusion/mmdet3d/datasets/
pipelines/):
  * loading.py:84-238  LoadPointsFromMultiSweeps  -> `load_points_multisweep`
  * transforms_3d.py:129-163 GlobalRotScaleTrans  -> `global_rot_scale_trans`
  * transforms_3d.py:252-280 RandomFlip3D         -> `random_flip_3d`
  * transforms_3d.py:796-869 Object/PointsRangeFilter -> `*_range_filter`
  * transforms_3d.py:871-890 ObjectNameFilter     -> `object_name_filter`
  * transforms_3d.py:789-795 PointShuffle         -> `point_shuffle`
  * dbsampler.py:17-277 UnifiedDataBaseSampler    -> `GTDatabaseSampler`
    (paste ground-truth objects from a database into the scene with BEV
    collision rejection, transforms_3d.py:281-614 UnifiedObjectSample)

Everything operates on plain numpy dicts with boxes as [N, 7+] arrays
(x, y, z_bottom, dx, dy, dz, yaw, [vx, vy]) in the keyframe lidar frame —
the same schema `DetectionSceneDataset` emits — and stays on the host; the
device only sees the fixed-shape voxelized batch.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mobi_tpu.data.nuscenes_tables import load_lidar_points


def _remove_close(points: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Drop ego-vehicle returns (loading.py:147-168)."""
    keep = ~(
        (np.abs(points[:, 0]) < radius) & (np.abs(points[:, 1]) < radius)
    )
    return points[keep]


def load_points_multisweep(
    rec: Dict,
    sweeps_num: int = 9,
    use_dim: Sequence[int] = (0, 1, 2, 3, 4),
    pad_empty_sweeps: bool = True,
    remove_close: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Aggregate the keyframe cloud with `sweeps_num` previous sweeps
    (LoadPointsFromMultiSweeps, loading.py:169-233): each sweep is
    transformed into the keyframe lidar frame and stamped with its time lag
    in a 5th (index 4 after use_dim) channel. Returns [N, len(use_dim)]
    with dim 4 = time lag (0 for the keyframe)."""
    key = load_lidar_points(rec["lidar_path"]).astype(np.float32)
    if key.shape[1] < 5:
        key = np.concatenate(
            [key, np.zeros((len(key), 5 - key.shape[1]), np.float32)], 1
        )
    key[:, 4] = 0.0
    # The keyframe cloud is kept UNFILTERED — the reference applies
    # _remove_close only to padded copies and previous sweeps
    # (loading.py:184-193, 218-219).
    clouds = [key]

    sweeps = rec.get("sweeps", [])
    if not sweeps and pad_empty_sweeps:
        pad = _remove_close(key) if remove_close else key
        clouds = clouds + [pad] * sweeps_num
    else:
        if len(sweeps) <= sweeps_num:
            chosen = list(range(len(sweeps)))
        elif rng is not None:
            chosen = list(rng.choice(len(sweeps), sweeps_num, replace=False))
        else:
            chosen = list(range(sweeps_num))
        for i in chosen:
            sw = sweeps[i]
            pts = load_lidar_points(sw["data_path"]).astype(np.float32)
            if pts.shape[1] < 5:
                pts = np.concatenate(
                    [pts, np.zeros((len(pts), 5 - pts.shape[1]), np.float32)], 1
                )
            if remove_close:
                pts = _remove_close(pts)
            T = np.asarray(sw["sweep2lidar"], np.float32)
            pts[:, :3] = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
            pts[:, 4] = float(sw["time_lag"])
            clouds.append(pts)
    points = np.concatenate(clouds, axis=0)
    return points[:, list(use_dim)]


def global_rot_scale_trans(
    points: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    rot_range: Tuple[float, float] = (-0.78539816, 0.78539816),
    scale_range: Tuple[float, float] = (0.9, 1.1),
    trans_std: Tuple[float, float, float] = (0.5, 0.5, 0.5),
) -> Tuple[np.ndarray, np.ndarray]:
    """Scene-level rotate/scale/translate (GlobalRotScaleTrans,
    transforms_3d.py:129-163). Boxes [N, 7+] with yaw at 6 and optional
    velocity at 7:9."""
    points = points.copy()
    boxes = boxes.copy()
    angle = rng.uniform(*rot_range)
    scale = rng.uniform(*scale_range)
    trans = rng.normal(scale=trans_std, size=3)

    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]], np.float32)
    points[:, :2] = points[:, :2] @ R.T
    points[:, :3] = points[:, :3] * scale + trans

    if len(boxes):
        boxes[:, :2] = boxes[:, :2] @ R.T
        boxes[:, :3] = boxes[:, :3] * scale + trans
        boxes[:, 3:6] *= scale
        boxes[:, 6] += angle
        if boxes.shape[1] >= 9:
            boxes[:, 7:9] = boxes[:, 7:9] @ R.T
            boxes[:, 7:9] *= scale
    # 4x4 lidar-frame transform applied to points: p' = s * Rz(angle) p + t
    # (the reference records this as lidar_aug_matrix for the camera
    # vtransform, transforms_3d.py:155-161)
    M = np.eye(4, dtype=np.float32)
    M[:2, :2] = scale * R
    M[2, 2] = scale
    M[:3, 3] = trans
    return points, boxes, M


def random_flip_3d(
    points: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    flip_ratio_horizontal: float = 0.5,
    flip_ratio_vertical: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """BEV flips (RandomFlip3D, transforms_3d.py:252-280): horizontal flips
    y, vertical flips x; yaw/velocity mirrored accordingly."""
    points = points.copy()
    boxes = boxes.copy()
    M = np.eye(4, dtype=np.float32)
    if rng.uniform() < flip_ratio_horizontal:
        points[:, 1] = -points[:, 1]
        M[1, 1] = -1.0
        if len(boxes):
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
            if boxes.shape[1] >= 9:
                boxes[:, 8] = -boxes[:, 8]
    if rng.uniform() < flip_ratio_vertical:
        points[:, 0] = -points[:, 0]
        M[0, 0] = -1.0
        if len(boxes):
            boxes[:, 0] = -boxes[:, 0]
            boxes[:, 6] = np.pi - boxes[:, 6]
            if boxes.shape[1] >= 9:
                boxes[:, 7] = -boxes[:, 7]
    return points, boxes, M


def points_range_filter(
    points: np.ndarray, pc_range: Sequence[float]
) -> np.ndarray:
    """(PointsRangeFilter, transforms_3d.py:846-869)"""
    lo, hi = np.asarray(pc_range[:3]), np.asarray(pc_range[3:6])
    keep = ((points[:, :3] >= lo) & (points[:, :3] <= hi)).all(axis=1)
    return points[keep]


def object_range_filter(
    boxes: np.ndarray, labels: np.ndarray, pc_range: Sequence[float]
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep boxes whose BEV center is in range + limit yaw period
    (ObjectRangeFilter, transforms_3d.py:796-845)."""
    lo = np.asarray(pc_range[:2])
    hi = np.asarray(pc_range[3:5])
    keep = ((boxes[:, :2] >= lo) & (boxes[:, :2] <= hi)).all(axis=1)
    boxes, labels = boxes[keep].copy(), labels[keep]
    boxes[:, 6] = (boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
    return boxes, labels


def object_name_filter(
    boxes: np.ndarray, names: Sequence[str], classes: Sequence[str]
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep boxes of the requested classes, returning integer labels
    (ObjectNameFilter, transforms_3d.py:871-890)."""
    keep = [i for i, n in enumerate(names) if n in classes]
    labels = np.asarray([classes.index(names[i]) for i in keep], np.int64)
    return boxes[keep], labels


def point_shuffle(
    points: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    return points[rng.permutation(len(points))]


def _bev_collision(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Axis-aligned-enclosing BEV overlap test [A, B] — the coarse rejection
    used when pasting sampled objects (dbsampler.py sample_class_v2 uses
    box_collision_test; an enclosing-AABB check is a strict superset, i.e.
    it only rejects more)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), bool)

    def aabb(b):
        r = np.hypot(b[:, 3], b[:, 4]) / 2.0
        return b[:, 0] - r, b[:, 0] + r, b[:, 1] - r, b[:, 1] + r

    ax0, ax1, ay0, ay1 = aabb(boxes_a)
    bx0, bx1, by0, by1 = aabb(boxes_b)
    ox = (ax0[:, None] <= bx1[None]) & (bx0[None] <= ax1[:, None])
    oy = (ay0[:, None] <= by1[None]) & (by0[None] <= ay1[:, None])
    return ox & oy


def build_gt_database(
    dataset,
    out_dir: str,
    classes: Sequence[str],
    min_points: int = 5,
) -> str:
    """Create a GT-paste database from a DetectionSceneDataset: per annotated
    box, crop its interior points (in the box frame) and record an info row
    (the reference's create_groundtruth_database). Returns the info pkl path."""
    from mobi_tpu.native import points_in_boxes

    os.makedirs(out_dir, exist_ok=True)
    infos: Dict[str, List[dict]] = {c: [] for c in classes}
    for i in range(len(dataset)):
        ex = dataset[i]
        pts = np.asarray(ex["points"], np.float32)
        boxes = np.asarray(ex["gt_bboxes_3d"], np.float32)
        names = list(ex["gt_names"])
        if not len(boxes):
            continue
        inside = points_in_boxes(pts[:, :3], boxes)  # [N] box idx or -1
        for j, name in enumerate(names):
            if name not in infos:
                continue
            obj_pts = pts[inside == j].copy()
            if len(obj_pts) < min_points:
                continue
            # store points relative to the box center (x, y, z_bottom)
            obj_pts[:, :3] -= boxes[j, :3]
            fname = f"{ex['sample_token']}_{name}_{j}.npy"
            np.save(os.path.join(out_dir, fname), obj_pts)
            infos[name].append(
                {"path": fname, "box": boxes[j].tolist(),
                 "num_points": int(len(obj_pts))}
            )
    pkl = os.path.join(out_dir, "gt_db_infos.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(infos, f)
    return pkl


class GTDatabaseSampler:
    """Paste sampled GT objects into a scene until per-class targets are met
    (UnifiedDataBaseSampler.sample_all, dbsampler.py:127-277): draw
    candidates per class, reject any that collide (BEV) with existing or
    previously accepted boxes, translate their stored points to the new box,
    and remove scene points that fall inside pasted boxes."""

    def __init__(
        self,
        db_info_path: str,
        sample_groups: Dict[str, int],
        min_points: int = 5,
        seed: int = 0,
    ):
        with open(db_info_path, "rb") as f:
            self.infos = pickle.load(f)
        self.root = os.path.dirname(db_info_path)
        self.sample_groups = dict(sample_groups)
        self.min_points = min_points
        self.rng = np.random.default_rng(seed)

    def __call__(
        self,
        points: np.ndarray,
        boxes: np.ndarray,
        labels: np.ndarray,
        classes: Sequence[str],
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        from mobi_tpu.native import points_in_boxes

        rng = self.rng
        new_boxes, new_labels, new_points = [], [], []
        all_boxes = boxes.copy() if len(boxes) else np.zeros((0, 7), np.float32)
        for cls, target in self.sample_groups.items():
            if cls not in self.infos or not self.infos[cls]:
                continue
            have = int((labels == classes.index(cls)).sum()) if len(labels) else 0
            need = max(target - have, 0)
            if need == 0:
                continue
            cand_idx = rng.permutation(len(self.infos[cls]))[: need * 2]
            taken = 0
            for ci in cand_idx:
                if taken >= need:
                    break
                info = self.infos[cls][int(ci)]
                box = np.asarray(info["box"], np.float32)[None, :7]
                if _bev_collision(box, all_boxes[:, :7]).any():
                    continue
                obj = np.load(os.path.join(self.root, info["path"]))
                obj = obj.copy()
                obj[:, :3] += box[0, :3]
                new_boxes.append(box[0])
                new_labels.append(classes.index(cls))
                new_points.append(obj)
                all_boxes = np.concatenate([all_boxes, box_pad_like(box, all_boxes)], 0)
                taken += 1

        if not new_boxes:
            return points, boxes, labels
        nb = np.stack(new_boxes)
        # remove original points inside pasted boxes (ObjectPaste semantics)
        inside = points_in_boxes(points[:, :3].astype(np.float32), nb)
        points = points[inside < 0]
        np_new = np.concatenate(new_points, axis=0)
        if np_new.shape[1] < points.shape[1]:
            np_new = np.concatenate(
                [np_new, np.zeros((len(np_new),
                                   points.shape[1] - np_new.shape[1]),
                                  np.float32)], 1
            )
        points = np.concatenate([points, np_new[:, : points.shape[1]]], 0)
        nb_full = box_pad_like(nb, boxes)
        boxes = np.concatenate([boxes, nb_full], 0) if len(boxes) else nb_full
        labels = np.concatenate(
            [labels, np.asarray(new_labels, labels.dtype if len(labels) else np.int64)]
        )
        return points, boxes, labels


def box_pad_like(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Pad [N, 7] boxes with zeros to match ref's trailing dims (velocity)."""
    want = ref.shape[1] if ref.ndim == 2 and ref.shape[1] > 7 else src.shape[1]
    if src.shape[1] >= want:
        return src[:, :want]
    pad = np.zeros((len(src), want - src.shape[1]), src.dtype)
    return np.concatenate([src, pad], 1)


def train_pipeline(
    rec: Dict,
    classes: Sequence[str],
    rng: np.random.Generator,
    pc_range: Sequence[float] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0),
    sweeps_num: int = 9,
    sampler: Optional[GTDatabaseSampler] = None,
) -> Dict[str, np.ndarray]:
    """The composed BEVFusion lidar training pipeline (configs/nuscenes/
    default.yaml train pipeline order: load -> paste -> rot/scale/trans ->
    flip -> range filters -> shuffle)."""
    points = load_points_multisweep(rec, sweeps_num=sweeps_num, rng=rng)
    boxes = np.asarray(rec["gt_bboxes_3d"], np.float32)
    # train with 9-DOF boxes: append per-annotation lidar-frame velocity so
    # the vel regression head sees real targets (reference
    # nuscenes_dataset.py:352-356, with_velocity=True; nan -> 0)
    vel = rec.get("gt_velocity")
    if vel is not None and len(boxes) and boxes.shape[1] == 7:
        vel = np.nan_to_num(np.asarray(vel, np.float32).reshape(-1, 2))
        boxes = np.concatenate([boxes, vel], 1)
    boxes, labels = object_name_filter(boxes, rec["gt_names"], classes)
    if sampler is not None:
        points, boxes, labels = sampler(points, boxes, labels, classes)
    points, boxes, M_rst = global_rot_scale_trans(points, boxes, rng)
    points, boxes, M_flip = random_flip_3d(points, boxes, rng)
    boxes, labels = object_range_filter(boxes, labels, pc_range)
    points = points_range_filter(points, pc_range)
    points = point_shuffle(points, rng)
    return {
        "points": points, "gt_bboxes_3d": boxes, "gt_labels_3d": labels,
        # composed lidar-frame aug (rst first, then flip) — the camera
        # vtransform composes this into cam2lidar so camera BEV features
        # land in the augmented lidar frame (reference bevfusion.py
        # lidar_aug_matrix plumbing)
        "lidar_aug_matrix": M_flip @ M_rst,
    }


def grid_mask(
    images: np.ndarray,
    rng: np.random.Generator,
    prob: float = 0.7,
    ratio: float = 0.5,
    max_rotate: int = 1,
) -> np.ndarray:
    """Stripe-grid occlusion over the camera images (GridMask,
    transforms_3d.py:164-251): a random-period grid of zeroed bands in both
    axes, the same mask applied to every view. images: [V, H, W, C]."""
    if rng.uniform() > prob:
        return images
    v, h, w = images.shape[:3]
    hh, ww = int(1.5 * h), int(1.5 * w)
    d = int(rng.integers(2, min(h, w)))
    band = min(max(int(d * ratio + 0.5), 1), d - 1)
    mask = np.ones((hh, ww), np.float32)
    st_h, st_w = int(rng.integers(d)), int(rng.integers(d))
    for i in range(hh // d):
        s = d * i + st_h
        mask[s:min(s + band, hh), :] = 0
    for i in range(ww // d):
        s = d * i + st_w
        mask[:, s:min(s + band, ww)] = 0
    if max_rotate > 1:
        import cv2

        r = float(rng.integers(max_rotate))
        M = cv2.getRotationMatrix2D((ww / 2, hh / 2), r, 1.0)
        mask = cv2.warpAffine(mask, M, (ww, hh), borderValue=1.0)
    mask = mask[(hh - h) // 2:(hh - h) // 2 + h,
                (ww - w) // 2:(ww - w) // 2 + w]
    return images * mask[None, :, :, None]


def object_noise(
    points: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    translation_std: Sequence[float] = (0.25, 0.25, 0.25),
    rot_range: Sequence[float] = (-0.15707963, 0.15707963),
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-object pose jitter: each GT box (and its interior points) gets an
    independent rotation about its center + translation, rejected if it
    would collide with another box (ObjectNoise, transforms_3d.py:714-768 /
    numba noise_per_object_v3_, single-try variant)."""
    from mobi_tpu.native import points_in_boxes

    if not len(boxes):
        return points, boxes
    points = points.copy()
    boxes = boxes.copy()
    inside = points_in_boxes(points[:, :3].astype(np.float32),
                             boxes[:, :7].astype(np.float32))
    for j in range(len(boxes)):
        trans = rng.normal(scale=translation_std, size=3)
        ang = rng.uniform(*rot_range)
        cand = boxes[j].copy()
        cand[:3] += trans
        cand[6] += ang
        others = np.delete(boxes, j, axis=0)
        if len(others) and _bev_collision(cand[None, :7], others[:, :7]).any():
            continue
        sel = inside == j
        if sel.any():
            c, s = np.cos(ang), np.sin(ang)
            rel = points[sel, :2] - boxes[j, :2]
            points[sel, 0] = rel[:, 0] * c - rel[:, 1] * s + boxes[j, 0]
            points[sel, 1] = rel[:, 0] * s + rel[:, 1] * c + boxes[j, 1]
            points[sel, :3] += trans
        boxes[j] = cand
    return points, boxes


def frame_dropout(
    points: np.ndarray, rng: np.random.Generator, prob: float = 0.5,
    time_dim: int = 4,
) -> np.ndarray:
    """Randomly drop whole (non-keyframe) sweeps by their time-lag value
    (FrameDropout, transforms_3d.py:770-787)."""
    keep_offsets = [
        off for off in np.unique(points[:, time_dim])
        if off == 0 or rng.uniform() > prob
    ]
    return points[np.isin(points[:, time_dim], keep_offsets)]


def point_sample(
    points: np.ndarray, num_points: int, rng: np.random.Generator,
) -> np.ndarray:
    """Sample/pad to a fixed point count (PointSample,
    transforms_3d.py:796-... random choice, with replacement only when the
    cloud is smaller than the target)."""
    replace = len(points) < num_points
    choice = rng.choice(len(points), num_points, replace=replace)
    return points[choice]


def background_points_filter(
    points: np.ndarray,
    boxes: np.ndarray,
    bbox_enlarge_range: float = 0.4,
) -> np.ndarray:
    """Drop background points that hug the GT boxes (BackgroundPointsFilter,
    transforms_3d.py:994-1050): points inside the enlarged boxes but outside
    the original ones are removed."""
    from mobi_tpu.native import points_in_boxes

    if not len(boxes):
        return points
    p3 = points[:, :3].astype(np.float32)
    b7 = boxes[:, :7].astype(np.float32)
    enlarged = b7.copy()
    enlarged[:, 3:6] += 2 * bbox_enlarge_range
    in_orig = points_in_boxes(p3, b7) >= 0
    in_big = points_in_boxes(p3, enlarged) >= 0
    return points[in_orig | ~in_big]


def fold_img_aug(
    lidar2image: np.ndarray,
    camera_intrinsics: np.ndarray,
    img_aug_matrix: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold per-view 2D affines (ImageAug3D `img_aug_matrix` [V, 4, 4])
    into projective matrices: (ud, vd, d) -> (a00*ud + a01*vd + tx*d, ...),
    i.e. the affine's translation lands in the DEPTH column. Returns new
    (lidar2image [V, 4, 4], camera_intrinsics [V, 4, 4]); downstream
    geometry (sparse depth maps, the LSS frustum) then needs no separate
    aug matrix."""
    l2i = np.asarray(lidar2image, np.float64).copy()
    intr = np.asarray(camera_intrinsics, np.float64).copy()
    for v in range(img_aug_matrix.shape[0]):
        A = np.eye(4)
        A[:2, :2] = img_aug_matrix[v, :2, :2]
        A[:2, 2] = img_aug_matrix[v, :2, 3]
        l2i[v] = A @ l2i[v]
        intr[v, :3, :3] = A[:3, :3] @ intr[v, :3, :3]
    return l2i.astype(np.float32), intr.astype(np.float32)


def image_aug_3d(
    images: np.ndarray,
    rng: Optional[np.random.Generator],
    final_dim: Tuple[int, int] = (256, 704),
    resize_lim: Tuple[float, float] = (0.38, 0.55),
    bot_pct_lim: Tuple[float, float] = (0.0, 0.0),
    rot_lim: Tuple[float, float] = (-5.4, 5.4),
    rand_flip: bool = True,
    is_train: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-view resize/crop/flip/rotate with the 4x4 post-homography
    `img_aug_matrix` the LSS view transform consumes (ImageAug3D,
    transforms_3d.py:31-128). images: [V, H, W, C] float; returns
    (aug_images [V, fH, fW, C], img_aug_matrix [V, 4, 4])."""
    import cv2

    v = images.shape[0]
    H, W = images.shape[1:3]
    fH, fW = final_dim
    out_imgs = np.empty((v, fH, fW, images.shape[3]), images.dtype)
    out_mats = np.empty((v, 4, 4), np.float32)
    for i in range(v):
        if is_train and rng is not None:
            resize = rng.uniform(*resize_lim)
            flip = rand_flip and bool(rng.integers(2))
            rotate = rng.uniform(*rot_lim)
            newW, newH = int(W * resize), int(H * resize)
            crop_h = int((1 - rng.uniform(*bot_pct_lim)) * newH) - fH
            crop_w = int(rng.uniform(0, max(0, newW - fW)))
        else:
            resize = float(np.mean(resize_lim))
            flip, rotate = False, 0.0
            newW, newH = int(W * resize), int(H * resize)
            crop_h = int((1 - np.mean(bot_pct_lim)) * newH) - fH
            crop_w = int(max(0, newW - fW) / 2)
        img = cv2.resize(images[i], (newW, newH))
        canvas = np.zeros((fH, fW, images.shape[3]), images.dtype)
        # PIL crop semantics: negative crop offsets pad with black, so the
        # patch lands at output row/col -crop when crop < 0 — keep the pixels
        # consistent with the recorded img_aug_matrix translation.
        y0, x0 = max(crop_h, 0), max(crop_w, 0)
        oy, ox = -min(crop_h, 0), -min(crop_w, 0)
        patch = img[y0:crop_h + fH, x0:crop_w + fW]
        canvas[oy:oy + patch.shape[0], ox:ox + patch.shape[1]] = patch
        if flip:
            canvas = canvas[:, ::-1]
        if rotate:
            M = cv2.getRotationMatrix2D((fW / 2, fH / 2), -rotate, 1.0)
            canvas = cv2.warpAffine(canvas, M, (fW, fH))
            if canvas.ndim == 2:
                canvas = canvas[..., None]
        out_imgs[i] = canvas

        rot = np.eye(2) * resize
        tran = -np.asarray([crop_w, crop_h], np.float64)
        if flip:
            A = np.asarray([[-1.0, 0.0], [0.0, 1.0]])
            rot = A @ rot
            tran = A @ tran + np.asarray([fW, 0.0])
        theta = rotate / 180.0 * np.pi
        A = np.asarray(
            [[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]]
        )
        b = np.asarray([fW, fH]) / 2.0
        b = A @ (-b) + b
        rot = A @ rot
        tran = A @ tran + b
        mat = np.eye(4, dtype=np.float32)
        mat[:2, :2] = rot
        mat[:2, 3] = tran
        out_mats[i] = mat
    return out_imgs, out_mats

"""Legacy Paint-by-Example / LDM auxiliary datasets (host-side numpy, NHWC).

Equivalents of the reference's non-nuScenes data surfaces:
  * OpenImagesDataset  — PbE pretraining pairs from OpenImages bbox files
    (/root/reference/ldm/data/open-images.py:62-258): pick a bbox, build the
    reference crop (+10px pad, augment), an extended-bbox inpaint mask
    (optionally an "arbitrary" smooth-polygon mask), a bbox-aware random
    square crop, and resize to `image_size`.
  * COCOTestBenchDataset — the PbE COCO test bench reader
    (/root/reference/ldm/data/test_bench_dataset.py:61-106): GT/Ref/Mask
    folder triplets by id list.
  * ImageNetFolder / ImageNetSR — folder-listing ImageNet base + the
    super-resolution pair variant (/root/reference/ldm/data/imagenet.py).
  * LSUNBase (+Churches/Bedrooms/Cats splits) — txt-file-driven center-crop
    dataset (/root/reference/ldm/data/lsun.py:9-92).

All emit float32 HWC arrays in the model ranges used elsewhere in mobi_tpu
([-1, 1] images, CLIP-normalized refs) so they drop into the same training
loop as the nuScenes dataset. Decoding stays on the host (PIL/cv2); the
device only ever sees fixed-shape batches.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mobi_tpu.data.augment import (
    ref_augment,
    resize_image,
    to_clip_input,
    to_model_range,
)


def _load_rgb(path: str) -> np.ndarray:
    """uint8 HWC RGB."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _smooth_polygon_mask(
    h: int, w: int, bbox: Sequence[int], rng: np.random.Generator
) -> np.ndarray:
    """Random smooth polygon around the bbox — the reference's bezier
    'arbitrary mask' (open-images.py:168-204) rebuilt with a jittered
    quadratic-bezier ring (no external bezier dependency). Returns float
    [h, w] with 1 = inpaint region."""
    import cv2

    x0, y0, x1, y1 = bbox
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    # control points: bbox corners + jittered edge midpoints
    anchors = np.array(
        [
            [x0, y0], [cx, y0 - rng.uniform(0, 0.2) * (y1 - y0)], [x1, y0],
            [x1, cy], [x1 + rng.uniform(0, 0.2) * (x1 - x0), cy], [x1, y1],
            [x1, y1], [cx, y1 + rng.uniform(0, 0.2) * (y1 - y0)], [x0, y1],
            [x0, cy], [x0 - rng.uniform(0, 0.2) * (x1 - x0), cy], [x0, y0],
        ],
        np.float32,
    )
    pts: List[List[float]] = []
    jitter = 5.0
    for e in range(4):
        p0, pc, p1 = anchors[3 * e], anchors[3 * e + 1], anchors[3 * e + 2]
        for t in np.linspace(0.05, 0.95, 18):
            p = (1 - t) ** 2 * p0 + 2 * (1 - t) * t * pc + t**2 * p1
            pts.append(
                [p[0] + rng.uniform(-jitter, jitter),
                 p[1] + rng.uniform(-jitter, jitter)]
            )
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(np.float32)


class OpenImagesDataset:
    """PbE pretraining dataset over OpenImages bbox annotation files.

    Directory layout (reference open-images.py:85-106):
      dataset_dir/bbox/{train_0..train_f | validation | test}/<id>.txt
      dataset_dir/images/<split_dir>/<id>.jpg
    Each txt line: "x0 y0 x1 y1 ..." in pixels.
    """

    BAD_LIST = frozenset(
        {
            "1af17f3d912e9aac.txt", "1d5ef05c8da80e31.txt",
            "3095084b358d3f2d.txt", "3ad7415a11ac1f5e.txt",
            "42a30d8f8fba8b40.txt", "1366cde3b480a15c.txt",
            "03a53ed6ab408b9f.txt",
        }
    )

    def __init__(
        self,
        state: str,
        dataset_dir: str,
        image_size: int = 512,
        arbitrary_mask_percent: float = 0.0,
        seed: int = 0,
    ):
        self.dataset_dir = dataset_dir
        self.image_size = image_size
        self.arbitrary_mask_percent = arbitrary_mask_percent
        self._rng = np.random.default_rng(seed)
        if state == "train":
            dirs = [f"train_{c}" for c in "0123456789abcdef"]
        elif state == "validation":
            dirs = ["validation"]
        else:
            dirs = ["test"]
        self.bbox_paths: List[str] = []
        for d in dirs:
            bbox_dir = os.path.join(dataset_dir, "bbox", d)
            if not os.path.isdir(bbox_dir):
                continue
            for name in os.listdir(bbox_dir):
                if name not in self.BAD_LIST:
                    self.bbox_paths.append(os.path.join(bbox_dir, name))
        self.bbox_paths.sort()

    def __len__(self) -> int:
        return len(self.bbox_paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = self._rng
        bbox_path = self.bbox_paths[index]
        stem = os.path.splitext(os.path.basename(bbox_path))[0]
        split_dir = os.path.basename(os.path.dirname(bbox_path))
        img_path = os.path.join(
            self.dataset_dir, "images", split_dir, stem + ".jpg"
        )
        with open(bbox_path) as f:
            boxes = [
                [int(float(v)) for v in line.split()[:4]]
                for line in f.read().splitlines() if line.strip()
            ]
        bbox = boxes[int(rng.integers(len(boxes)))]
        img = _load_rgb(img_path)
        h, w = img.shape[:2]

        # reference crop: bbox padded by up to 10 px, augmented to 224
        pad = [
            max(bbox[0] - 10, 0), max(bbox[1] - 10, 0),
            min(bbox[2] + 10, w), min(bbox[3] + 10, h),
        ]
        ref = img[pad[1]:pad[3], pad[0]:pad[2]]
        ref = ref_augment(ref, rng, size=224)

        # inpaint mask over a randomly extended bbox (up to 40% of the free
        # space on each side, open-images.py:155-166)
        ext = [
            bbox[0] - int(rng.integers(0, max(int(0.4 * bbox[0]), 1))),
            bbox[1] - int(rng.integers(0, max(int(0.4 * bbox[1]), 1))),
            bbox[2] + int(rng.integers(0, max(int(0.4 * (w - bbox[2])), 1))),
            bbox[3] + int(rng.integers(0, max(int(0.4 * (h - bbox[3])), 1))),
        ]
        if rng.uniform() < self.arbitrary_mask_percent:
            region = _smooth_polygon_mask(h, w, bbox, rng)
        else:
            region = np.zeros((h, w), np.float32)
            region[ext[1]:ext[3], ext[0]:ext[2]] = 1.0

        # bbox-aware square crop (open-images.py:208-246): keep the extended
        # bbox inside a square window, then random margin shrink
        img_f = to_model_range(img)
        side = min(h, w)
        if w > h:
            lo = max(ext[2] - side, 0)
            hi = min(ext[0], w - side)
            x_off = int(rng.integers(lo, hi + 1)) if hi >= lo else 0
            sl = np.s_[0:side, x_off:x_off + side]
        elif h > w:
            lo = max(ext[3] - side, 0)
            hi = min(ext[1], h - side)
            y_off = int(rng.integers(lo, hi + 1)) if hi >= lo else 0
            sl = np.s_[y_off:y_off + side, 0:side]
        else:
            sl = np.s_[0:side, 0:side]
        img_sq = img_f[sl]
        mask_sq = region[sl]

        s = self.image_size
        gt = resize_image(img_sq, s, s).astype(np.float32)
        keep = 1.0 - np.clip(resize_image(mask_sq, s, s), 0.0, 1.0)
        keep = keep[..., None].astype(np.float32)
        return {
            "GT": gt,
            "inpaint_image": gt * keep,
            "inpaint_mask": keep,
            "ref_img": to_clip_input(ref),
        }


class COCOTestBenchDataset:
    """PbE COCO test bench: (GT, mask, ref) folder triplets
    (test_bench_dataset.py:61-106)."""

    def __init__(self, test_bench_dir: str, id_list_path: Optional[str] = None):
        self.dir = test_bench_dir
        path = id_list_path or os.path.join(test_bench_dir, "id_list.npy")
        self.ids = [int(i) for i in np.load(path).tolist()]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import cv2

        sid = str(self.ids[index]).zfill(12)
        gt = to_model_range(
            _load_rgb(os.path.join(self.dir, "GT_3500", sid + "_GT.png"))
        )
        ref = _load_rgb(os.path.join(self.dir, "Ref_3500", sid + "_ref.png"))
        ref = resize_image(ref, 224, 224)
        mask_img = cv2.imread(
            os.path.join(self.dir, "Mask_bbox_3500", sid + "_mask.png"),
            cv2.IMREAD_GRAYSCALE,
        )
        keep = (1.0 - mask_img.astype(np.float32) / 255.0)[..., None]
        return {
            "GT": gt.astype(np.float32),
            "inpaint_image": (gt * keep).astype(np.float32),
            "inpaint_mask": keep.astype(np.float32),
            "ref_img": to_clip_input(ref),
            "id": sid,
        }


class ImageNetFolder:
    """Minimal ImageNet folder dataset (imagenet.py:26-270 compressed): a
    file list (txt or directory walk) -> center-cropped, resized [-1,1]
    images + synset label from the path."""

    def __init__(
        self,
        data_root: str,
        size: Optional[int] = 256,
        file_list: Optional[str] = None,
        flip_p: float = 0.0,
        seed: int = 0,
    ):
        self.size = size
        self.flip_p = flip_p
        self._rng = np.random.default_rng(seed)
        if file_list:
            with open(file_list) as f:
                rels = f.read().splitlines()
        else:
            rels = []
            for dirpath, _, names in os.walk(data_root):
                for n in sorted(names):
                    if n.lower().endswith((".jpg", ".jpeg", ".png")):
                        rels.append(
                            os.path.relpath(os.path.join(dirpath, n), data_root)
                        )
            rels.sort()
        self.paths = [os.path.join(data_root, r) for r in rels]
        self.rel_paths = rels
        synsets = sorted({r.split(os.sep)[0] for r in rels})
        self.synset_to_idx = {s: i for i, s in enumerate(synsets)}

    def __len__(self) -> int:
        return len(self.paths)

    def _load_square(self, i: int) -> np.ndarray:
        img = _load_rgb(self.paths[i])
        h, w = img.shape[:2]
        crop = min(h, w)
        img = img[(h - crop) // 2:(h + crop) // 2,
                  (w - crop) // 2:(w + crop) // 2]
        if self.size is not None:
            img = resize_image(img, self.size, self.size)
        if self.flip_p and self._rng.uniform() < self.flip_p:
            img = img[:, ::-1].copy()
        return img

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        img = self._load_square(i)
        synset = self.rel_paths[i].split(os.sep)[0]
        return {
            "image": to_model_range(img),
            "class_label": np.int32(self.synset_to_idx.get(synset, -1)),
            "relative_file_path_": self.rel_paths[i],
        }


class ImageNetSR(ImageNetFolder):
    """Super-resolution pair variant (imagenet.py:272-374): emits the HR
    image plus an LR version downscaled by `downscale_f`."""

    def __init__(self, *args, downscale_f: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.downscale_f = downscale_f

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        img = self._load_square(i)
        lr = resize_image(
            img, self.size // self.downscale_f, self.size // self.downscale_f
        )
        return {
            "image": to_model_range(img),
            "LR_image": to_model_range(lr),
            "relative_file_path_": self.rel_paths[i],
        }


class LSUNBase:
    """txt-file listing + center crop + resize + random flip
    (lsun.py:9-60)."""

    def __init__(
        self,
        txt_file: str,
        data_root: str,
        size: Optional[int] = None,
        flip_p: float = 0.5,
        seed: int = 0,
    ):
        with open(txt_file) as f:
            self.rel_paths = f.read().splitlines()
        self.paths = [os.path.join(data_root, r) for r in self.rel_paths]
        self.size = size
        self.flip_p = flip_p
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        img = _load_rgb(self.paths[i])
        h, w = img.shape[:2]
        crop = min(h, w)
        img = img[(h - crop) // 2:(h + crop) // 2,
                  (w - crop) // 2:(w + crop) // 2]
        if self.size is not None:
            img = resize_image(img, self.size, self.size)
        if self._rng.uniform() < self.flip_p:
            img = img[:, ::-1].copy()
        return {
            "image": to_model_range(img),
            "relative_file_path_": self.rel_paths[i],
        }


def lsun_split(name: str, split: str, data_root: str = "data/lsun", **kw):
    """Factory for the reference's LSUN{Churches,Bedrooms,Cats}{Train,
    Validation} subclasses (lsun.py:62-92)."""
    txt = {
        ("churches", "train"): "church_outdoor_train.txt",
        ("churches", "validation"): "church_outdoor_val.txt",
        ("bedrooms", "train"): "bedrooms_train.txt",
        ("bedrooms", "validation"): "bedrooms_val.txt",
        ("cats", "train"): "cat_train.txt",
        ("cats", "validation"): "cat_val.txt",
    }[(name, split)]
    flip_p = kw.pop("flip_p", 0.5 if split == "train" else 0.0)
    return LSUNBase(
        os.path.join(data_root, txt),
        os.path.join(data_root, name), flip_p=flip_p, **kw,
    )

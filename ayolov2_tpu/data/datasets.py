"""Datasets: image folders and detection (images + labels/segments).

Parity targets (SURVEY.md C13/C14; /root/reference/scripts/data_loader/
data_loader.py):
  - recursive glob over IMG_EXTS, n_skip subsampling (:49-120)
  - EXIF-aware shape scan cached to ``*.cache`` keyed by file set + version
    (:194-230, :911-1000)
  - rect-batch aspect-ratio bucketing quantized to stride multiples (:232-256)
  - letterbox (:395-459)
  - label txt parsing from labels/ or segments/ dirs, segments->boxes (:911-1000)
  - mosaic-4 (:726-830), mixup, copy_paste/copy_paste2, random_perspective,
    per-policy pixel augs, HSV (:613-724)
  - in-memory image cache (:121-148 'mem' mode)

TPU-first deltas: __getitem__ returns HWC uint8 (NHWC batches; /255 happens
on device), labels stay (n, 5) [cls, xywh-norm] and are padded to a fixed
capacity at collate time, and every random draw flows through a seeded
np.random.Generator for reproducibility.
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np
from PIL import Image, ExifTags

from ayolov2_tpu.data.augment import (
    MultiAugmentationPolicies,
    augment_hsv,
    copy_paste,
    copy_paste2,
    hsv_gains,
    mixup,
    perspective_matrix,
    perspective_targets,
    random_perspective,
)
from ayolov2_tpu.utils.boxes import xyn2xy, xywh2xyxy, xyxy2xywh
from ayolov2_tpu.utils.general import segments2boxes
from ayolov2_tpu.utils.constants import IMG_EXTS
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)
CACHE_VERSION = "ayolo-tpu-v1"

# cv2 must not thread-spawn inside data workers (general.py:29-31)
cv2.setNumThreads(0)

_ORIENT_KEY = next((k for k, v in ExifTags.TAGS.items() if v == "Orientation"), None)


def exif_size(img: Image.Image) -> Tuple[int, int]:
    """(w, h) corrected for EXIF rotation (data_loader.py shape scan)."""
    s = img.size
    try:
        rotation = dict(img._getexif().items())[_ORIENT_KEY]
        if rotation in (6, 8):  # 270 / 90 degrees
            s = (s[1], s[0])
    except Exception:
        pass
    return s


def letterbox(
    im: np.ndarray,
    new_shape: Tuple[int, int],
    stride: int = 32,
    color: Tuple[int, int, int] = (114, 114, 114),
    auto: bool = True,
    scale_fill: bool = False,
    scale_up: bool = True,
) -> Tuple[np.ndarray, Tuple[float, float], Tuple[float, float]]:
    """Resize + pad preserving aspect ratio (parity: data_loader.py:395-459).

    Returns (image, (rw, rh) resize ratio, (dw, dh) one-side padding).
    """
    shape = im.shape[:2]  # (h, w)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scale_up:
        r = min(r, 1.0)

    ratio = (r, r)
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw: float = new_shape[1] - new_unpad[0]
    dh: float = new_shape[0] - new_unpad[1]

    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])

    dw /= 2
    dh /= 2

    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)


def _glob_images(path: Union[str, Path, Sequence[str]]) -> List[str]:
    paths = [path] if isinstance(path, (str, Path)) else list(path)
    files: List[str] = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            files += [str(f) for f in sorted(p.rglob("*")) if f.suffix.lower() in IMG_EXTS]
        elif p.is_file() and p.suffix.lower() in IMG_EXTS:
            files.append(str(p))
    return files


def _files_hash(files: Sequence[str]) -> str:
    h = hashlib.sha1()
    for f in files:
        h.update(f.encode())
        try:
            h.update(str(Path(f).stat().st_size).encode())
        except OSError:
            pass
    return h.hexdigest()


class ImageFolderDataset:
    """Image-only dataset with shape cache + rect batching (LoadImages, C13)."""

    def __init__(
        self,
        path: Union[str, Path, Sequence[str]],
        img_size: int = 640,
        batch_size: int = 16,
        rect: bool = False,
        pad: float = 0.0,
        stride: int = 32,
        n_skip: int = 0,
        cache_images: Optional[str] = None,
        scale_up: bool = False,
    ) -> None:
        self.img_size = img_size
        self.stride = stride
        self.rect = rect
        self.pad = pad
        self.batch_size = batch_size
        self.scale_up = scale_up

        self.img_files = _glob_images(path)
        if n_skip > 0:
            self.img_files = self.img_files[:: n_skip + 1]
        assert self.img_files, f"No images found in {path}"

        self.shapes = self._scan_shapes()  # (n, 2) wh
        self.indices = np.arange(len(self.img_files))
        self.batch_idx = np.floor(np.arange(len(self.img_files)) / batch_size).astype(int)
        if rect:
            self._setup_rect_batches()

        self._img_cache: Dict[int, Tuple[np.ndarray, Tuple[int, int], Tuple[int, int]]] = {}
        self.cache_images = cache_images
        if cache_images == "mem":
            for i in range(len(self.img_files)):
                self._img_cache[i] = self._load_image_nocache(i)

    # -- shape scan with on-disk cache -----------------------------------
    def _cache_path(self) -> Path:
        root = Path(self.img_files[0]).parent
        return root / f".{root.name}_shapes.cache"

    def _scan_shapes(self) -> np.ndarray:
        cache_file = self._cache_path()
        key = _files_hash(self.img_files) + CACHE_VERSION
        if cache_file.exists():
            try:
                with open(cache_file, "rb") as f:
                    data = pickle.load(f)
                if data.get("key") == key:
                    return data["shapes"]
            except Exception:
                pass
        shapes = []
        for f in self.img_files:
            try:
                with Image.open(f) as img:
                    shapes.append(exif_size(img))
            except Exception as e:
                LOGGER.warning("Corrupt image %s: %s", f, e)
                shapes.append((self.img_size, self.img_size))
        arr = np.array(shapes, dtype=np.int64)
        try:
            with open(cache_file, "wb") as f:
                pickle.dump({"key": key, "shapes": arr}, f)
        except OSError:
            pass
        return arr

    # -- rect batching (data_loader.py:232-256) ---------------------------
    def _setup_rect_batches(self) -> None:
        n = len(self.img_files)
        ar = self.shapes[:, 1] / self.shapes[:, 0]  # h / w
        irect = ar.argsort()
        self.img_files = [self.img_files[i] for i in irect]
        self.shapes = self.shapes[irect]
        ar = ar[irect]

        nb = self.batch_idx[-1] + 1
        shapes = [[1.0, 1.0]] * nb
        for i in range(nb):
            ari = ar[self.batch_idx == i]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                shapes[i] = [maxi, 1.0]
            elif mini > 1:
                shapes[i] = [1.0, 1.0 / mini]
        self.batch_shapes = (
            np.ceil(np.array(shapes) * self.img_size / self.stride + self.pad).astype(int) * self.stride
        )  # (nb, 2) as (h, w)

    # -- image loading -----------------------------------------------------
    def _load_image_nocache(self, index: int):
        path = self.img_files[index]
        im = cv2.imread(path)  # BGR
        assert im is not None, f"Image read failed: {path}"
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if (r < 1 and not self.scale_up) else cv2.INTER_LINEAR
            im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    def _npy_path(self, index: int) -> Path:
        return Path(self.img_files[index]).with_suffix(".ayolo.npy")

    def load_image(self, index: int, copy: bool = True):
        """``copy=False`` returns the cached array itself — only for readers
        that never mutate it (the mosaic paste loop slices the source)."""
        if index in self._img_cache:
            im, orig, resized = self._img_cache[index]
            return (im.copy() if copy else im), orig, resized
        if self.cache_images in ("disk", "dynamic_disk"):
            npy = self._npy_path(index)
            if npy.exists():
                try:  # self-healing on stale/corrupt npy (data_loader.py:308-313)
                    data = np.load(npy, allow_pickle=True).item()
                    return data["im"], data["orig"], data["resized"]
                except Exception:
                    npy.unlink(missing_ok=True)
        item = self._load_image_nocache(index)
        if self.cache_images == "dynamic_mem":
            self._img_cache[index] = item
        elif self.cache_images in ("disk", "dynamic_disk"):
            try:
                np.save(self._npy_path(index), {"im": item[0], "orig": item[1], "resized": item[2]})
            except OSError:
                pass
        return item

    def __len__(self) -> int:
        return len(self.img_files)

    def target_shape(self, index: int) -> Tuple[int, int]:
        return (
            tuple(self.batch_shapes[self.batch_idx[index]])
            if self.rect
            else (self.img_size, self.img_size)
        )

    def __getitem__(self, index: int):
        """Returns (img HWC-BGR uint8, (h0, w0), ((ratio), (pad))).

        ratio is the TOTAL content scale native->letterboxed (h1/h0, w1/w0),
        composing load_image's resize with the letterbox — what scale_coords
        expects as ratio_pad (reference val2 shapes semantics; same
        composition as DetectionDataset.get_item). Returning only the
        letterbox-step ratio (1.0 for pre-resized content) left predictions
        pad-corrected but un-descaled — caught by the answersheet golden.
        """
        im, (h0, w0), (h1, w1) = self.load_image(index)
        shape = self.target_shape(index)
        im, _, pad_wh = letterbox(im, shape, stride=self.stride, auto=False, scale_up=self.scale_up)
        return im, (h0, w0), ((h1 / h0, w1 / w0), pad_wh)


def _parse_label_file(path: Path) -> Tuple[np.ndarray, List[np.ndarray]]:
    """One label txt -> ((n, 5) [cls, xywh-norm], segments list)."""
    if not path.exists():
        return np.zeros((0, 5), np.float32), []
    with open(path, encoding="utf-8") as f:
        rows = [ln.split() for ln in f.read().strip().splitlines() if len(ln)]
    if not rows:
        return np.zeros((0, 5), np.float32), []
    if any(len(r) > 6 for r in rows):  # segment polygons
        classes = np.array([r[0] for r in rows], np.float32)
        segments = [np.array(r[1:], np.float32).reshape(-1, 2) for r in rows]
        boxes = segments2boxes(segments)
        labels = np.concatenate([classes.reshape(-1, 1), boxes], 1).astype(np.float32)
        return labels, segments
    labels = np.array(rows, dtype=np.float32).reshape(-1, 5)
    assert (labels[:, 1:] <= 1.001).all(), f"non-normalized coordinates in {path}"
    return labels, []


def _img2label_path(img_path: str, label_type: str) -> Path:
    p = Path(img_path)
    parts = list(p.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = label_type
            break
    return Path(*parts).with_suffix(".txt")


class DetectionDataset(ImageFolderDataset):
    """Images + labels with full train-time augmentation (LoadImagesAndLabels)."""

    def __init__(
        self,
        path: Union[str, Path, Sequence[str]],
        img_size: int = 640,
        batch_size: int = 16,
        rect: bool = False,
        pad: float = 0.0,
        stride: int = 32,
        n_skip: int = 0,
        cache_images: Optional[str] = None,
        label_type: str = "labels",  # "labels" | "segments"
        yolo_augmentation: Optional[Dict[str, Any]] = None,
        augmentation: Optional[List[Dict]] = None,
        single_cls: bool = False,
        seed: int = 0,
    ) -> None:
        self.yolo_augmentation = yolo_augmentation or {}
        self.augment = bool(self.yolo_augmentation.get("augment", False))
        super().__init__(
            path, img_size, batch_size, rect, pad, stride, n_skip, cache_images,
            scale_up=self.augment,
        )
        self.label_type = label_type
        self.single_cls = single_cls
        self.policies = MultiAugmentationPolicies(augmentation) if augmentation else None
        self.seed = seed
        self.epoch = 0  # published by DataLoader each epoch
        self.rng = np.random.default_rng(seed)

        self.labels, self.segments = self._load_labels()
        if single_cls:
            for lab in self.labels:
                lab[:, 0] = 0

    def _item_rng(self, index: int, salt: int = 0) -> np.random.Generator:
        """Per-(seed, epoch, item, salt) RNG: deterministic regardless of how
        many loader workers run __getitem__ concurrently (a shared Generator
        is not thread-safe), and varying across epochs like the reference's
        global-RNG draws. ``salt`` is the item's position in the epoch order:
        with weighted image resampling (replace=True) the same index can
        occur many times per epoch, and without the salt every occurrence
        would get byte-identical augmentations — defeating the oversampling."""
        return np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch, index, salt]))

    def _load_labels(self) -> Tuple[List[np.ndarray], List[List[np.ndarray]]]:
        cache_file = self._cache_path().with_suffix(".labels")
        key = _files_hash(self.img_files) + CACHE_VERSION + self.label_type
        if cache_file.exists():
            try:
                with open(cache_file, "rb") as f:
                    data = pickle.load(f)
                if data.get("key") == key:
                    return data["labels"], data["segments"]
            except Exception:
                pass
        labels, segments = [], []
        n_missing = 0
        for f in self.img_files:
            lab, seg = _parse_label_file(_img2label_path(f, self.label_type))
            if not len(lab):
                n_missing += 1
            labels.append(lab)
            segments.append(seg)
        if n_missing:
            LOGGER.warning("%d / %d images have no labels", n_missing, len(self.img_files))
        try:
            with open(cache_file, "wb") as f:
                pickle.dump({"key": key, "labels": labels, "segments": segments}, f)
        except OSError:
            pass
        return labels, segments

    # -- mosaic (data_loader.py:726-830) ----------------------------------
    def load_mosaic(self, index: int, rng: Optional[np.random.Generator] = None) -> Tuple[np.ndarray, np.ndarray]:
        s = self.img_size
        half = s // 2
        rng = self.rng if rng is None else rng
        mc_h, mc_w = (int(rng.uniform(half, 2 * s - half)) for _ in range(2))
        indices = [index] + list(rng.choice(self.indices, 3))
        rng.shuffle(indices)

        mosaic_img = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
        mosaic_labels, mosaic_segments = [], []

        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx, copy=False)
            if i == 0:  # top left
                x1a, y1a, x2a, y2a = max(mc_w - w, 0), max(mc_h - h, 0), mc_w, mc_h
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top right
                x1a, y1a, x2a, y2a = mc_w, max(mc_h - h, 0), min(mc_w + w, s * 2), mc_h
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom left
                x1a, y1a, x2a, y2a = max(mc_w - w, 0), mc_h, mc_w, min(s * 2, mc_h + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom right
                x1a, y1a, x2a, y2a = mc_w, mc_h, min(mc_w + w, s * 2), min(s * 2, mc_h + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)

            mosaic_img[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            pad_w, pad_h = x1a - x1b, y1a - y1b

            labels = self.labels[idx].copy() if self.labels[idx].size else np.zeros((0, 5), np.float32)
            segs = [seg.copy() for seg in self.segments[idx]]
            if labels.size:
                labels[:, 1:] = xywh2xyxy(labels[:, 1:], wh=(w, h), pad=(pad_w, pad_h))
                segs = [xyn2xy(x, wh=(w, h), pad=(pad_w, pad_h)) for x in segs]
            mosaic_labels.append(labels)
            mosaic_segments.extend(segs)

        labels4 = np.concatenate(mosaic_labels, 0)
        for x in (labels4[:, 1:], *mosaic_segments):
            np.clip(x, 1e-3, 2 * s, out=x)

        mosaic_img, labels4, mosaic_segments = copy_paste(
            mosaic_img, labels4, mosaic_segments, rng, p=self.yolo_augmentation.get("copy_paste", 0.0)
        )

        cp2 = self.yolo_augmentation.get("copy_paste2") or {}
        if cp2.get("p", 0.0) > 0.0:
            for _ in range(cp2.get("n_img", 3)):
                mosaic_img, labels4, mosaic_segments = self._cross_copy_paste(
                    mosaic_img, labels4, mosaic_segments, rng
                )

        mosaic_img, labels4 = random_perspective(
            mosaic_img,
            labels4,
            rng,
            segments=mosaic_segments,
            degrees=self.yolo_augmentation.get("degrees", 0.0),
            translate=self.yolo_augmentation.get("translate", 0.1),
            scale=self.yolo_augmentation.get("scale", 0.5),
            shear=self.yolo_augmentation.get("shear", 0.0),
            perspective=self.yolo_augmentation.get("perspective", 0.0),
            border=(-half, -half),
        )
        return mosaic_img, labels4

    def _cross_copy_paste(self, img, labels, segs, rng: Optional[np.random.Generator] = None):
        """Pick a random donor image and paste its segments (kd of copy_paste2)."""
        rng = self.rng if rng is None else rng
        cp2 = self.yolo_augmentation.get("copy_paste2") or {}
        j = int(rng.integers(0, len(self.img_files)))
        img2, _, (h2, w2) = self.load_image(j)
        labels2 = self.labels[j].copy() if self.labels[j].size else np.zeros((0, 5), np.float32)
        segs2 = [seg.copy() for seg in self.segments[j]]
        if labels2.size:
            labels2[:, 1:] = xywh2xyxy(labels2[:, 1:], wh=(w2, h2))
            segs2 = [xyn2xy(x, wh=(w2, h2)) for x in segs2]
        return copy_paste2(
            img, labels, segs, img2, labels2, segs2, rng,
            scale_min=cp2.get("scale_min", 0.35),
            scale_max=cp2.get("scale_max", 1.0),
            p=cp2.get("p", 0.0),
            n_trial=cp2.get("n_trial", 5),
            area_thr=cp2.get("area_thr", 10),
            ioa_thr=cp2.get("ioa_thr", 0.3),
        )

    # -- on-device augmentation planning (data/device_augment.py) ---------
    #
    # plan_item/plan_mosaic mirror get_item/load_mosaic EXACTLY — same
    # seeded-RNG draw order, same label math (shared helpers
    # perspective_matrix/perspective_targets/hsv_gains) — but defer every
    # pixel operation to the device renderer. Eligibility is checked once at
    # enable time: features that interleave RNG draws with pixel reads
    # (copy_paste/copy_paste2) or pixel-only policies cannot be planned.

    def device_aug_ineligible(self) -> Optional[str]:
        """None when this config can run on-device; else the blocking reason."""
        ya = self.yolo_augmentation
        if self.rect:
            return "rect batching (device aug is square-letterbox only)"
        if ya.get("copy_paste", 0.0):
            return "copy_paste > 0 (interleaves RNG with pixel reads; host-only)"
        if (ya.get("copy_paste2") or {}).get("p", 0.0):
            return "copy_paste2 > 0 (interleaves RNG with pixel reads; host-only)"
        if self.policies is not None:
            for pol in self.policies.policies:
                for name in pol.get("policy", {}):
                    if name not in ("HorizontalFlip", "VerticalFlip"):
                        return f"pixel policy {name} (host-only)"
        return None

    def enable_device_aug(self, resident: bool = True) -> None:
        """Switch get_item to PLAN mode: items become (plan, labels, path,
        shapes) and the DataLoader collates them into PlanBatches for the
        device renderer. ``resident=True`` additionally pre-assembles every
        source frame into one (N, s, s, 3) uint8 array for a one-time HBM
        upload (per-batch H2D shrinks to indices + geometry) — use it when
        the dataset fits device memory (the golden/fixture regime)."""
        reason = self.device_aug_ineligible()
        if reason:
            raise ValueError(f"device augmentation unsupported: {reason}")
        self.device_aug = True
        self.device_aug_resident = resident
        if resident and getattr(self, "resident_frames", None) is None:
            self._build_resident_frames()

    def _build_resident_frames(self) -> None:
        s = self.img_size
        n = len(self.img_files)
        nbytes = n * s * s * 3
        LOGGER.info("building resident frame store: %d frames, %.1f MB", n, nbytes / 1e6)
        self.resident_frames = np.full((n, s, s, 3), 114, np.uint8)
        self.frame_hw = np.zeros((n, 2), np.int32)
        for i in range(n):
            im, _, (h, w) = self.load_image(i, copy=False)
            self.resident_frames[i, :h, :w] = im
            self.frame_hw[i] = (h, w)

    def _src_hw(self, idx: int) -> Tuple[int, int]:
        """Resized (h1, w1) of a source frame without copying pixels."""
        if getattr(self, "frame_hw", None) is not None:
            return int(self.frame_hw[idx, 0]), int(self.frame_hw[idx, 1])
        return self.load_image(idx, copy=False)[2]

    def plan_mosaic(self, index: int, rng: np.random.Generator, plan: Dict[str, np.ndarray], pair: int) -> np.ndarray:
        """load_mosaic with pixels deferred: fills plan slot geometry for
        ``pair`` and returns the transformed labels. RNG draw order is
        IDENTICAL to load_mosaic (mc center, 3-donor choice, shuffle,
        perspective draws) — parity-tested in tests/test_device_augment.py."""
        s = self.img_size
        half = s // 2
        mc_h, mc_w = (int(rng.uniform(half, 2 * s - half)) for _ in range(2))
        indices = [index] + list(rng.choice(self.indices, 3))
        rng.shuffle(indices)

        mosaic_labels, mosaic_segments = [], []
        for i, idx in enumerate(indices):
            idx = int(idx)
            h, w = self._src_hw(idx)
            if i == 0:  # top left
                x1a, y1a, x2a, y2a = max(mc_w - w, 0), max(mc_h - h, 0), mc_w, mc_h
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
            elif i == 1:  # top right
                x1a, y1a, x2a, y2a = mc_w, max(mc_h - h, 0), min(mc_w + w, s * 2), mc_h
                x1b, y1b = 0, h - (y2a - y1a)
            elif i == 2:  # bottom left
                x1a, y1a, x2a, y2a = max(mc_w - w, 0), mc_h, mc_w, min(s * 2, mc_h + h)
                x1b, y1b = w - (x2a - x1a), 0
            else:  # bottom right
                x1a, y1a, x2a, y2a = mc_w, mc_h, min(mc_w + w, s * 2), min(s * 2, mc_h + h)
                x1b, y1b = 0, 0
            plan["src_idx"][pair, i] = idx
            plan["rects"][pair, i] = (x1a, y1a, x2a, y2a)
            plan["offs"][pair, i] = (x1a - x1b, y1a - y1b)
            pad_w, pad_h = x1a - x1b, y1a - y1b

            labels = self.labels[idx].copy() if self.labels[idx].size else np.zeros((0, 5), np.float32)
            segs = [seg.copy() for seg in self.segments[idx]]
            if labels.size:
                labels[:, 1:] = xywh2xyxy(labels[:, 1:], wh=(w, h), pad=(pad_w, pad_h))
                segs = [xyn2xy(x, wh=(w, h), pad=(pad_w, pad_h)) for x in segs]
            mosaic_labels.append(labels)
            mosaic_segments.extend(segs)

        labels4 = np.concatenate(mosaic_labels, 0)
        for x in (labels4[:, 1:], *mosaic_segments):
            np.clip(x, 1e-3, 2 * s, out=x)
        # copy_paste / copy_paste2 are p=0 here (device_aug_ineligible):
        # with p=0 neither consumes RNG nor pixels in the host path

        persp = self.yolo_augmentation.get("perspective", 0.0)
        M, sc, width, height = perspective_matrix(
            (s * 2, s * 2),
            rng,
            degrees=self.yolo_augmentation.get("degrees", 0.0),
            translate=self.yolo_augmentation.get("translate", 0.1),
            scale=self.yolo_augmentation.get("scale", 0.5),
            shear=self.yolo_augmentation.get("shear", 0.0),
            perspective=persp,
            border=(-half, -half),
        )
        labels4 = perspective_targets(labels4, mosaic_segments, M, sc, width, height, persp)
        plan["minv"][pair] = np.linalg.inv(M).astype(np.float32)
        return labels4

    def plan_item(self, index: int, salt: int = 0):
        """get_item with pixels deferred -> (plan, labels, path, shapes)."""
        index = int(self.indices[index])
        rng = self._item_rng(index, salt)
        s = self.img_size
        ya = self.yolo_augmentation
        pairs = 2 if ya.get("mixup", 0.0) > 0 else 1
        plan: Dict[str, np.ndarray] = {
            "src_idx": np.zeros((pairs, 4), np.int32),
            "rects": np.zeros((pairs, 4, 4), np.int32),
            "offs": np.zeros((pairs, 4, 2), np.int32),
            "minv": np.tile(np.eye(3, dtype=np.float32)[None], (pairs, 1, 1)),
            "blend": np.float32(1.0),
            "hsv": np.ones(3, np.float32),
            "flips": np.zeros(2, np.int32),
        }

        if rng.random() < ya.get("mosaic", 0.0):
            labels = self.plan_mosaic(index, rng, plan, 0)
            shapes = ((0, 0), ((0.0, 0.0), (0.0, 0.0)))
            if rng.random() < ya.get("mixup", 0.0):
                j = int(rng.integers(0, len(self.img_files)))
                labels2 = self.plan_mosaic(j, rng, plan, 1)
                plan["blend"] = np.float32(rng.beta(32.0, 32.0))
                labels = np.concatenate((labels, labels2), 0)
            elif pairs == 2:
                # mixup configured but not triggered: pair 1 mirrors pair 0
                # with blend 1.0 so batch shapes stay static
                for k in ("src_idx", "rects", "offs", "minv"):
                    plan[k][1] = plan[k][0]
        else:
            h1, w1 = self._src_hw(index)
            w0, h0 = (int(v) for v in self.shapes[index])
            # letterbox geometry (letterbox() with auto=False, square shape)
            r = min(s / h1, s / w1)
            if not self.augment:  # scale_up=self.augment in get_item
                r = min(r, 1.0)
            new_w, new_h = int(round(w1 * r)), int(round(h1 * r))
            dw, dh = (s - new_w) / 2, (s - new_h) / 2
            top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
            shapes = ((h0, w0), ((h1 / h0, w1 / w0), (dw, dh)))

            labels = self.labels[index].copy() if self.labels[index].size else np.zeros((0, 5), np.float32)
            segments = [seg.copy() for seg in self.segments[index]]
            if labels.size:
                labels[:, 1:] = xywh2xyxy(labels[:, 1:], ratio=(r, r), wh=(w1, h1), pad=(dw, dh))
                segments = [xyn2xy(x, ratio=(r, r), wh=(w1, h1), pad=(dw, dh)) for x in segments]

            # source -> letterboxed frame affine, cv2.resize half-pixel
            # convention: x_dst = (x_src + 0.5) * (new_w / w1) - 0.5 + left
            L = np.eye(3)
            sx, sy = new_w / w1, new_h / h1
            L[0, 0], L[0, 2] = sx, 0.5 * sx - 0.5 + left
            L[1, 1], L[1, 2] = sy, 0.5 * sy - 0.5 + top

            if self.augment:
                persp = ya.get("perspective", 0.0)
                M2, sc, w_, h_ = perspective_matrix(
                    (s, s), rng,
                    degrees=ya.get("degrees", 0.0),
                    translate=ya.get("translate", 0.1),
                    scale=ya.get("scale", 0.5),
                    shear=ya.get("shear", 0.0),
                    perspective=persp,
                )
                labels = perspective_targets(labels, segments, M2, sc, w_, h_, persp)
                F = M2 @ L
            else:
                F = L
            plan["minv"][0] = np.linalg.inv(F).astype(np.float32)
            plan["src_idx"][0, 0] = index
            plan["rects"][0, 0] = (0, 0, w1, h1)
            if pairs == 2:
                for k in ("src_idx", "rects", "offs", "minv"):
                    plan[k][1] = plan[k][0]

        if labels.size:
            labels[:, 1:] = xyxy2xywh(labels[:, 1:], wh=(s, s), clip_eps=1e-3)

        if self.policies is not None:  # flips only (device_aug_ineligible)
            for pol in self.policies.policies:
                if rng.random() >= pol.get("prob", 1.0):
                    continue
                for name, params in pol.get("policy", {}).items():
                    params = dict(params or {})
                    p = params.pop("p", 0.5)
                    if rng.random() >= p:
                        continue
                    if name == "HorizontalFlip":
                        plan["flips"][0] ^= 1
                        if len(labels):
                            labels[:, 1] = 1.0 - labels[:, 1]
                    else:  # VerticalFlip
                        plan["flips"][1] ^= 1
                        if len(labels):
                            labels[:, 2] = 1.0 - labels[:, 2]
        if self.augment:
            g = hsv_gains(
                rng,
                ya.get("hsv_h", 0.015), ya.get("hsv_s", 0.7), ya.get("hsv_v", 0.4),
            )
            if g is not None:
                plan["hsv"] = g.astype(np.float32)

        if not getattr(self, "device_aug_resident", True):
            # streaming mode: ship the (padded) source frames with the plan
            src = np.full((pairs, 4, s, s, 3), 114, np.uint8)
            for pair in range(pairs):
                for slot in range(4):
                    x1a, y1a, x2a, y2a = plan["rects"][pair, slot]
                    if x2a > x1a and y2a > y1a:
                        im, _, (h, w) = self.load_image(int(plan["src_idx"][pair, slot]), copy=False)
                        src[pair, slot, :h, :w] = im
            plan["src"] = src

        return plan, labels.astype(np.float32), self.img_files[index], shapes

    def __getitem__(self, index: int):
        """Returns (img HWC-BGR uint8, (n, 5) [cls, xywh-norm], path, shapes)."""
        return self.get_item(index, 0)

    def get_item(self, index: int, salt: int = 0):
        """__getitem__ with an epoch-position salt (see :meth:`_item_rng`);
        the DataLoader passes each item's position so repeated indices from
        weighted resampling draw fresh augmentations."""
        if getattr(self, "device_aug", False):
            return self.plan_item(index, salt)
        index = int(self.indices[index])
        rng = self._item_rng(index, salt)
        shape = self.target_shape(index)

        if rng.random() < self.yolo_augmentation.get("mosaic", 0.0):
            img, labels = self.load_mosaic(index, rng)
            shapes = ((0, 0), ((0.0, 0.0), (0.0, 0.0)))
            if rng.random() < self.yolo_augmentation.get("mixup", 0.0):
                img, labels = mixup(
                    img, labels, *self.load_mosaic(int(rng.integers(0, len(self.img_files))), rng), rng
                )
        else:
            img, (h0, w0), resized = self.load_image(index)
            h1, w1 = resized
            img, ratio, pad = letterbox(
                img, shape, stride=self.stride, auto=False, scale_up=self.augment
            )
            shapes = ((h0, w0), ((h1 / h0, w1 / w0), pad))

            labels = self.labels[index].copy() if self.labels[index].size else np.zeros((0, 5), np.float32)
            segments = [seg.copy() for seg in self.segments[index]]
            if labels.size:
                labels[:, 1:] = xywh2xyxy(labels[:, 1:], ratio=ratio, wh=(w1, h1), pad=pad)
                segments = [xyn2xy(x, ratio=ratio, wh=(w1, h1), pad=pad) for x in segments]

            cp2 = self.yolo_augmentation.get("copy_paste2") or {}
            if cp2.get("p", 0.0) > 0.0:
                for _ in range(cp2.get("n_img", 3)):
                    img, labels, segments = self._cross_copy_paste(img, labels, segments, rng)

            if self.augment:
                img, labels = random_perspective(
                    img,
                    labels,
                    rng,
                    degrees=self.yolo_augmentation.get("degrees", 0.0),
                    translate=self.yolo_augmentation.get("translate", 0.1),
                    scale=self.yolo_augmentation.get("scale", 0.5),
                    shear=self.yolo_augmentation.get("shear", 0.0),
                    perspective=self.yolo_augmentation.get("perspective", 0.0),
                )

        if labels.size:
            labels[:, 1:] = xyxy2xywh(labels[:, 1:], wh=img.shape[:2][::-1], clip_eps=1e-3)

        if self.policies is not None:
            img, labels = self.policies(img, labels, rng)
        if self.augment:
            img = np.ascontiguousarray(img)
            augment_hsv(
                img,
                rng,
                self.yolo_augmentation.get("hsv_h", 0.015),
                self.yolo_augmentation.get("hsv_s", 0.7),
                self.yolo_augmentation.get("hsv_v", 0.4),
            )

        return np.ascontiguousarray(img), labels.astype(np.float32), self.img_files[index], shapes

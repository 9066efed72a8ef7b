"""YOLO functional augmentations (host-side numpy/cv2).

Behavioral parity targets in /root/reference/scripts/augmentation/
yolo_augmentation.py: copy_paste (:21-64), copy_paste2 (:79-196),
random_perspective (:199-332), cutout (:335-373), mixup (:376-394),
augment_hsv (:397-422); plus the named-policy engine of
scripts/augmentation/augmentation.py:63-138 (albumentations-by-name — here
implemented directly with cv2 since albumentations isn't available).

RNG discipline: every function takes a ``np.random.Generator`` so workers
are seedable and runs reproducible (SURVEY §7 'Augmentation RNG fidelity' —
we do not replicate Python's `random` stream, we make ours deterministic).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ayolov2_tpu.utils.boxes import bbox_ioa
from ayolov2_tpu.utils.general import box_candidates, resample_segments, segment2box


def hsv_gains(
    rng: np.random.Generator, hgain: float, sgain: float, vgain: float
) -> Optional[np.ndarray]:
    """The augment_hsv random draw alone (None when HSV is disabled —
    mirrors augment_hsv's early return, which consumes NO rng). Shared by
    the host LUT path and the on-device augmentation planner so both consume
    the identical stream."""
    if not (hgain or sgain or vgain):
        return None
    return rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1


def augment_hsv(
    im: np.ndarray, rng: np.random.Generator, hgain: float = 0.5, sgain: float = 0.5, vgain: float = 0.5
) -> np.ndarray:
    """LUT-based HSV jitter (in place on a BGR uint8 image)."""
    r = hsv_gains(rng, hgain, sgain, vgain)
    if r is None:
        return im
    x = np.arange(0, 256, dtype=r.dtype)
    # one fused 3-channel LUT (cv2.LUT maps per-channel when the table has
    # im's channel count): same pixels as the reference's split/3xLUT/merge
    # (yolo_augmentation.py:397-422) at ~60% of the host cost — this runs
    # per sample in the training hot loop
    lut = np.empty((1, 256, 3), im.dtype)
    lut[0, :, 0] = ((x * r[0]) % 180).astype(im.dtype)
    lut[0, :, 1] = np.clip(x * r[1], 0, 255).astype(im.dtype)
    lut[0, :, 2] = np.clip(x * r[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.LUT(cv2.cvtColor(im, cv2.COLOR_BGR2HSV), lut)
    cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=im)
    return im


def mixup(
    im: np.ndarray, labels: np.ndarray, im2: np.ndarray, labels2: np.ndarray, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Beta(32, 32) image blend, labels concatenated."""
    r = rng.beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    return im, np.concatenate((labels, labels2), 0)


def cutout(im: np.ndarray, labels: np.ndarray, rng: np.random.Generator, p: float = 0.5) -> np.ndarray:
    """Random occlusion masks; drops labels obscured > 60% (in place)."""
    if rng.random() >= p:
        return labels
    h, w = im.shape[:2]
    scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
    for s in scales:
        mask_h = rng.integers(1, max(int(h * s), 2))
        mask_w = rng.integers(1, max(int(w * s), 2))
        xmin = max(0, int(rng.integers(0, w)) - mask_w // 2)
        ymin = max(0, int(rng.integers(0, h)) - mask_h // 2)
        xmax = min(w, xmin + mask_w)
        ymax = min(h, ymin + mask_h)
        im[ymin:ymax, xmin:xmax] = [int(rng.integers(64, 192)) for _ in range(3)]
        if len(labels) and s > 0.03:
            box = np.array([xmin, ymin, xmax, ymax], dtype=np.float32)
            ioa = bbox_ioa(box, labels[:, 1:5])
            labels = labels[ioa < 0.60]
    return labels


def copy_paste(
    im: np.ndarray,
    labels: np.ndarray,
    segments: List[np.ndarray],
    rng: np.random.Generator,
    p: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    """Flip-LR segment paste within one image (IoA < 0.30 gate)."""
    n = len(segments)
    if p and n:
        h, w, _ = im.shape
        im_new = np.zeros(im.shape, np.uint8)
        for j in rng.permutation(n)[: round(p * n)]:
            lab, s = labels[j], segments[j]
            box = w - lab[3], lab[2], w - lab[1], lab[4]
            ioa = bbox_ioa(np.asarray(box, np.float32), labels[:, 1:5])
            if (ioa < 0.30).all():
                labels = np.concatenate((labels, [[lab[0], *box]]), 0)
                segments.append(np.concatenate((w - s[:, 0:1], s[:, 1:2]), 1))
                cv2.drawContours(im_new, [segments[j].astype(np.int32)], -1, (255, 255, 255), cv2.FILLED)
        result = cv2.bitwise_and(src1=im, src2=im_new)
        result = cv2.flip(result, 1)
        i = result > 0
        im[i] = result[i]
    return im, labels, segments


def copy_paste2(
    im1: np.ndarray,
    labels1: np.ndarray,
    seg1: List[np.ndarray],
    im2: np.ndarray,
    labels2: np.ndarray,
    seg2: List[np.ndarray],
    rng: np.random.Generator,
    scale_min: float = 0.35,
    scale_max: float = 1.0,
    p: float = 0.5,
    n_trial: int = 5,
    area_thr: float = 10,
    ioa_thr: float = 0.3,
) -> Tuple[np.ndarray, np.ndarray, List[np.ndarray]]:
    """Cross-image scaled object paste with placement retries."""
    n = len(seg2)
    if p and n:
        h, w, _ = im1.shape
        im_new = np.zeros(im1.shape, np.uint8)
        for j in rng.permutation(n)[: round(p * n)]:
            label, segment = labels2[j], seg2[j]
            if (int(label[4] - label[2]) * int(label[3] - label[1])) < area_thr:
                continue
            zero_box = label - np.array([0, label[1], label[2], label[1], label[2]])
            zero_seg = segment - label[1:3]
            for _ in range(n_trial):
                sf = rng.uniform(scale_min, scale_max)
                sbox = zero_box[1:] * sf
                max_x = w - (sbox[2] - sbox[0]) - 1
                max_y = h - (sbox[3] - sbox[1]) - 1
                if max_x <= 0 or max_y <= 0:
                    continue
                x = rng.uniform(0, max_x)
                y = rng.uniform(0, max_y)
                new_box = np.concatenate(([label[0]], sbox)) + np.array([0, x, y, x, y])
                ioa = bbox_ioa(new_box[1:5], labels1[:, 1:5]) if len(labels1) else np.zeros(0)
                if (ioa < ioa_thr).all():
                    bw = int(new_box[3]) - int(new_box[1])
                    bh = int(new_box[4]) - int(new_box[2])
                    if bw * bh < area_thr:
                        continue
                    labels1 = np.concatenate((labels1, [new_box]), 0) if len(labels1) else new_box[None]
                    seg1.append(zero_seg * sf + np.array([x, y]))
                    mask = np.zeros(im2.shape, np.uint8)
                    cv2.drawContours(mask, [segment.astype(np.int32)], -1, (255, 255, 255), cv2.FILLED)
                    cut = cv2.bitwise_and(src1=im2, src2=mask)
                    x1, y1, x2, y2 = int(label[1]), int(label[2]), int(label[3]), int(label[4])
                    obj = cv2.resize(cut[y1:y2, x1:x2, :], (0, 0), fx=sf, fy=sf)
                    px, py = int(x), int(y)
                    im_new[py : py + obj.shape[0], px : px + obj.shape[1], :] = obj
                    break
        i = im_new > 0
        im1[i] = im_new[i]
    return im1, labels1, seg1


def perspective_matrix(
    im_shape: Tuple[int, int],
    rng: np.random.Generator,
    degrees: float = 10,
    translate: float = 0.1,
    scale: float = 0.1,
    shear: float = 10,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
) -> Tuple[np.ndarray, float, int, int]:
    """Draw the random_perspective warp matrix WITHOUT touching pixels.

    Returns (M, s, width, height): M maps input(canvas)->output coords, s is
    the scale draw (box_candidates pre-scale), (width, height) the output
    size. The RNG draw ORDER (P, angle, scale, shear x2, translate x2) and
    the composition T @ S @ R @ P @ C are load-bearing — identical to the
    host warp path and to the reference (yolo_augmentation.py:199-332), so
    the device-augmentation planner consumes the same stream."""
    height = im_shape[0] + border[0] * 2
    width = im_shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -im_shape[1] / 2
    C[1, 2] = -im_shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    return T @ S @ R @ P @ C, float(s), width, height


def perspective_targets(
    targets: np.ndarray,
    segments: Sequence[np.ndarray],
    M: np.ndarray,
    s: float,
    width: int,
    height: int,
    perspective: float,
) -> np.ndarray:
    """Apply the warp matrix to targets (n, 5) [cls, xyxy] and filter by
    box_candidates — the label half of random_perspective, shared by the
    host warp and the device-augmentation planner."""
    n = len(targets)
    if n:
        use_segments = any(x.any() for x in segments)
        new = np.zeros((n, 4))
        if use_segments:
            segments = resample_segments(list(segments))
            for i, segment in enumerate(segments):
                xy = np.ones((len(segment), 3))
                xy[:, :2] = segment
                xy = xy @ M.T
                xy = xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]
                new[i] = segment2box(xy, width, height)
        else:
            xy = np.ones((n * 4, 3))
            xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
            xy = xy @ M.T
            xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)

        i = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T, area_thr=0.01 if use_segments else 0.10)
        targets = targets[i]
        targets[:, 1:5] = new[i]

    return targets


def random_perspective(
    im: np.ndarray,
    targets: np.ndarray,
    rng: np.random.Generator,
    segments: Sequence[np.ndarray] = (),
    degrees: float = 10,
    translate: float = 0.1,
    scale: float = 0.1,
    shear: float = 10,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Combined center/perspective/rotate-scale/shear/translate warp.

    targets are (n, 5) [cls, x1, y1, x2, y2]; the affine matrix composition
    order T @ S @ R @ P @ C is load-bearing. Matrix + label math live in
    :func:`perspective_matrix` / :func:`perspective_targets` (shared with
    the on-device augmentation planner); this wrapper adds the cv2 pixel
    warp — behavior identical to before the split."""
    M, s, width, height = perspective_matrix(
        im.shape[:2], rng, degrees, translate, scale, shear, perspective, border
    )
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    targets = perspective_targets(targets, segments, M, s, width, height, perspective)
    return im, targets


# --------------------------------------------------------------------------
# Named pixel-level policy engine — the reference's AugmentationPolicy
# (augmentation.py:63-138) maps albumentations transform names; we implement
# the names its shipped configs use (train_config.yaml augmentation section)
# directly with cv2. Each entry: name -> fn(img, rng, **params) -> img.
# Geometric flips additionally adjust labels.
# --------------------------------------------------------------------------


def _blur(im, rng, blur_limit=7):
    k = int(rng.integers(3, blur_limit + 1)) | 1
    return cv2.blur(im, (k, k))


def _median_blur(im, rng, blur_limit=7):
    k = int(rng.integers(3, blur_limit + 1)) | 1
    return cv2.medianBlur(im, k)


def _to_gray(im, rng):
    g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


def _clahe(im, rng, clip_limit=4.0, tile_grid_size=(8, 8)):
    clahe = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=tuple(tile_grid_size))
    lab = cv2.cvtColor(im, cv2.COLOR_BGR2LAB)
    lab[..., 0] = clahe.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)


def _brightness_contrast(im, rng, brightness_limit=0.2, contrast_limit=0.2):
    alpha = 1.0 + rng.uniform(-contrast_limit, contrast_limit)
    beta = rng.uniform(-brightness_limit, brightness_limit) * 255
    return cv2.convertScaleAbs(im, alpha=alpha, beta=beta)


def _random_gamma(im, rng, gamma_limit=(80, 120)):
    gamma = rng.uniform(gamma_limit[0], gamma_limit[1]) / 100.0
    lut = np.clip(((np.arange(256) / 255.0) ** gamma) * 255.0, 0, 255).astype(np.uint8)
    return cv2.LUT(im, lut)


def _image_compression(im, rng, quality_lower=75, quality_upper=100):
    q = int(rng.integers(quality_lower, quality_upper + 1))
    ok, enc = cv2.imencode(".jpg", im, [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR) if ok else im


def _affine(img, labels, rng, scale=None, translate_percent=None, rotate=None, shear=None):
    """Label-aware affine (albumentations.Affine-style ranges) via the
    random_perspective machinery. ``labels`` are (n, 5) [cls, xywh-norm]."""
    from ayolov2_tpu.utils.boxes import xywh2xyxy, xyxy2xywh

    h, w = img.shape[:2]
    lab = labels.copy()
    if len(lab):
        lab[:, 1:] = xywh2xyxy(lab[:, 1:], wh=(w, h))
    degrees = max(abs(rotate[0]), abs(rotate[1])) if rotate else 0.0
    shear_deg = max(abs(shear[0]), abs(shear[1])) if shear else 0.0
    scale_amp = max(abs(1 - scale[0]), abs(scale[1] - 1)) if scale else 0.0
    translate = 0.0
    if translate_percent:
        tx = translate_percent.get("x", [0, 0])
        ty = translate_percent.get("y", [0, 0])
        translate = max(abs(tx[0]), abs(tx[1]), abs(ty[0]), abs(ty[1]))
    img, lab = random_perspective(
        img, lab, rng, degrees=degrees, translate=translate,
        scale=scale_amp, shear=shear_deg, perspective=0.0,
    )
    if len(lab):
        lab[:, 1:] = xyxy2xywh(lab[:, 1:], wh=(w, h), clip_eps=1e-3)
    return img, lab


def _solarize(im, rng, threshold=128):
    lut = np.arange(256, dtype=np.uint8)
    lut[int(threshold):] = 255 - lut[int(threshold):]
    return cv2.LUT(im, lut)


def _sharpen(im, rng, alpha=(0.2, 0.5), lightness=(0.5, 1.0)):
    a = rng.uniform(*alpha)
    li = rng.uniform(*lightness)
    kernel = np.array([[-1, -1, -1], [-1, 8 + li, -1], [-1, -1, -1]], np.float32)
    sharp = cv2.filter2D(im, -1, kernel / max(kernel.sum(), 1e-6))
    return cv2.addWeighted(im, 1 - a, sharp, a, 0)


def _cutout_holes(im, rng, num_holes=1, max_h_size=128, max_w_size=128, fill_value=0):
    h, w = im.shape[:2]
    out = im.copy()
    for _ in range(int(num_holes)):
        ch = int(rng.integers(1, max_h_size + 1))
        cw = int(rng.integers(1, max_w_size + 1))
        y = int(rng.integers(0, max(h - ch, 1)))
        x = int(rng.integers(0, max(w - cw, 1)))
        out[y : y + ch, x : x + cw] = fill_value
    return out


_PIXEL_TRANSFORMS = {
    "Blur": _blur,
    "MedianBlur": _median_blur,
    "ToGray": _to_gray,
    "CLAHE": _clahe,
    "RandomBrightnessContrast": _brightness_contrast,
    "RandomGamma": _random_gamma,
    "ImageCompression": _image_compression,
    "Solarize": _solarize,
    "Sharpen": _sharpen,
    "Cutout": _cutout_holes,
}


class MultiAugmentationPolicies:
    """Sequential named-transform policies with probabilities.

    Config shape (train_config.yaml ``augmentation``)::

        - policy: {Blur: {p: 0.01}, HorizontalFlip: {p: 0.5}}
          prob: 1.0

    Unknown transform names raise at construction (fail fast, unlike the
    reference's runtime getattr).
    """

    def __init__(self, policies: Optional[List[Dict]] = None) -> None:
        self.policies = policies or []
        for pol in self.policies:
            for name in pol.get("policy", {}):
                if name not in _PIXEL_TRANSFORMS and name not in ("HorizontalFlip", "VerticalFlip", "Affine"):
                    raise ValueError(f"Unknown augmentation transform: {name}")

    def __call__(
        self, img: np.ndarray, labels: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Apply policies. ``labels`` are (n, 5) [cls, xywh-normalized]."""
        for pol in self.policies:
            if rng.random() >= pol.get("prob", 1.0):
                continue
            for name, params in pol.get("policy", {}).items():
                params = dict(params or {})
                p = params.pop("p", 0.5)
                if rng.random() >= p:
                    continue
                if name == "HorizontalFlip":
                    # cv2.flip == np.fliplr(...).copy() pixels, but emits a
                    # contiguous array ~3x faster (SIMD row reversal) —
                    # per-sample hot path
                    img = cv2.flip(img, 1)
                    if len(labels):
                        labels[:, 1] = 1.0 - labels[:, 1]
                elif name == "VerticalFlip":
                    img = cv2.flip(img, 0)
                    if len(labels):
                        labels[:, 2] = 1.0 - labels[:, 2]
                elif name == "Affine":
                    img, labels = _affine(img, labels, rng, **params)
                else:
                    img = _PIXEL_TRANSFORMS[name](img, rng, **params)
        return img, labels

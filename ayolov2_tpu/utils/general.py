"""General host-side utilities: sizing, segments, paths, profiling.

Parity targets in /root/reference/scripts/utils/general.py:
  - make_divisible / check_img_size (:58-91)
  - segment2box / segments2boxes / resample_segments (:36-128)
  - box_candidates (:131-159)
  - labels_to_class_weights / labels_to_image_weights (:162-200)
  - increment_path (:361-391)
  - TimeChecker (:394-516)
"""

from __future__ import annotations

import glob
import math
import re
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

from ayolov2_tpu.utils.boxes import xyxy2xywh
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


def make_divisible(x: float, divisor: int, minimum_check_number: int = 0) -> int:
    """Round ``x`` up to a multiple of ``divisor`` (floor if below threshold)."""
    if x <= minimum_check_number:
        return math.floor(x)
    return math.ceil(x / divisor) * divisor


def check_img_size(img_size: int, s: int = 32) -> int:
    """Snap image size up to a multiple of stride ``s``, warning on change."""
    new_size = make_divisible(img_size, int(s))
    if new_size != img_size:
        LOGGER.warning(
            "WARNING --img-size %g must be multiple of max stride %g, updating to %g",
            img_size,
            s,
            new_size,
        )
    return new_size


def segment2box(segment: np.ndarray, width: int = 640, height: int = 640) -> np.ndarray:
    """One (n, 2) polygon -> xyxy box clipped to in-image points."""
    x, y = segment.T
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    if x.size and x.any():
        return np.array([x.min(), y.min(), x.max(), y.max()])
    return np.zeros((1, 4))


def segments2boxes(segments: List[np.ndarray]) -> np.ndarray:
    """List of polygons -> (n, 4) xywh boxes."""
    boxes = [[s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()] for s in segments]
    return xyxy2xywh(np.array(boxes), check_validity=False)  # general.py:128


def resample_segments(segments: List[np.ndarray], n: int = 1000) -> List[np.ndarray]:
    """Resample each polygon to exactly ``n`` points via linear interpolation."""
    out = []
    for s in segments:
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.stack([np.interp(x, xp, s[:, i]) for i in range(2)], axis=-1))
    return out


def box_candidates(
    box1: np.ndarray,
    box2: np.ndarray,
    wh_thr: float = 2,
    ar_thr: float = 20,
    area_thr: float = 0.1,
    eps: float = 1e-16,
) -> np.ndarray:
    """Filter augmented boxes (box1 pre-, box2 post-augment; both (4, n) xyxy)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def labels_to_class_weights(labels: List[np.ndarray], nc: int = 80) -> np.ndarray:
    """Inverse-frequency class weights from a list of (n_i, 5) label arrays."""
    if len(labels) == 0 or labels[0] is None:
        return np.array([])
    classes = np.concatenate(labels, 0)[:, 0].astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    return weights / weights.sum()


def labels_to_image_weights(
    labels: List[np.ndarray], nc: int = 80, class_weights: Optional[np.ndarray] = None
) -> np.ndarray:
    """Per-image sampling weights = sum over classes of class_weight * count."""
    cw = np.ones(nc) if class_weights is None else class_weights
    counts = np.array([np.bincount(lab[:, 0].astype(int), minlength=nc) for lab in labels])
    return (cw.reshape(1, nc) * counts).sum(1)


def increment_path(path: Union[str, Path], exist_ok: bool = False, sep: str = "") -> str:
    """Auto-increment a run path: runs/exp -> runs/exp{sep}2, exp3, ...

    Parity: general.py:361-391.
    """
    path = Path(path)
    if (path.exists() and exist_ok) or (not path.exists()):
        return str(path)
    dirs = glob.glob(f"{path}{sep}*")
    matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.stem), d) for d in dirs]
    i = [int(m.groups()[0]) for m in matches if m]
    n = max(i) + 1 if i else 2
    return f"{path}{sep}{n}"


class TimeChecker:
    """Named wall-clock checkpoint profiler (parity: general.py:394-516).

    Usage::

        t = TimeChecker("val")
        t.add("start")
        ...work...
        t.add("forward")
        print(t)  # ratio-sorted report

    On TPU, call with ``blocking_fn=jax.block_until_ready`` semantics handled
    by the caller (sync before ``add`` for accurate device timing).
    """

    def __init__(self, title: str = "", ignore_thr: float = 0.05, sort: bool = True, add_start: bool = True) -> None:
        self.title = title
        self.ignore_thr = ignore_thr
        self.sort = sort
        self.times: Dict[str, List[float]] = defaultdict(list)
        self.order: List[str] = []
        if add_start:
            self.add("start")

    def add(self, name: str) -> None:
        if name not in self.times:
            self.order.append(name)
        self.times[name].append(time.monotonic())

    def _segments(self) -> Dict[str, float]:
        segs: Dict[str, float] = {}
        for prev, cur in zip(self.order[:-1], self.order[1:]):
            n = min(len(self.times[prev]), len(self.times[cur]))
            segs[cur] = float(sum(self.times[cur][i] - self.times[prev][i] for i in range(n)))
        return segs

    @property
    def total_time(self) -> float:
        return sum(self._segments().values())

    def __getitem__(self, name: str) -> float:
        return self._segments()[name]

    def __str__(self) -> str:
        segs = self._segments()
        total = sum(segs.values()) or 1e-12
        items = sorted(segs.items(), key=lambda kv: -kv[1]) if self.sort else list(segs.items())
        parts = [
            f"{name}: {dt:.4f}s ({100 * dt / total:.1f}%)"
            for name, dt in items
            if dt / total >= self.ignore_thr
        ]
        return f"[{self.title}] total {total:.4f}s | " + ", ".join(parts)


def init_seeds(seed: int = 0) -> "np.random.Generator":
    """Seed every host-side RNG (torch_utils.py:122-144 init_seeds parity).

    JAX randomness is explicit (PRNG keys derived from configs), so this
    covers the numpy/python generators used by the data pipeline and
    returns a fresh Generator for callers that want one. The reference's
    cudnn-determinism toggles have no TPU analogue: XLA is deterministic
    by construction for a fixed program.
    """
    import random

    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)

"""Datasets for representation learning: n augmented views per image.

Parity target: /root/reference/scripts/data_loader/data_loader_repr.py
(LoadImagesForRL :18-150, LoadImagesForSimCLR :152-236) and
scripts/representation_learning/crop_bboxes.py:38-73.

Each __getitem__ returns ``n_trans`` independently augmented views of one
image; the loader interleaves them image-major inside the batch (the
reference collate layout) so the RL/InfoNCE losses' even/odd and
repeat(arange(bs), n_trans) pairings hold.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import cv2
import numpy as np

from ayolov2_tpu.data.augment import MultiAugmentationPolicies, augment_hsv
from ayolov2_tpu.data.datasets import ImageFolderDataset, letterbox
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


class RLImageDataset(ImageFolderDataset):
    """n_trans augmented views per image (LoadImagesForRL parity)."""

    def __init__(
        self,
        path: Union[str, Sequence[str]],
        img_size: int = 320,
        batch_size: int = 16,
        n_skip: int = 0,
        stride: int = 32,
        n_trans: int = 2,
        augmentation: Optional[List[dict]] = None,
        seed: int = 0,
    ) -> None:
        super().__init__(path, img_size, batch_size, rect=False, stride=stride, n_skip=n_skip)
        self.n_trans = n_trans
        self.policies = MultiAugmentationPolicies(augmentation) if augmentation else None
        self.rng = np.random.default_rng(seed)

    def _augment_view(self, img: np.ndarray) -> np.ndarray:
        view = img.copy()
        if self.policies is not None:
            view, _ = self.policies(view, np.zeros((0, 5), np.float32), self.rng)
        augment_hsv(view, self.rng)
        if self.rng.random() < 0.5:
            view = np.fliplr(view)
        return np.ascontiguousarray(view)

    def __getitem__(self, index: int):
        """Returns (views (n_trans, H, W, 3) uint8, path, shapes)."""
        im, (h0, w0), _ = self.load_image(index)
        im, ratio, pad = letterbox(im, self.target_shape(index), stride=self.stride, auto=False)
        views = np.stack([self._augment_view(im) for _ in range(self.n_trans)])
        return views, self.img_files[index], ((h0, w0), (ratio, pad))


class SimCLRDataset(RLImageDataset):
    """SimCLR view pipeline: random resized crop + flip + color jitter + gray
    (LoadImagesForSimCLR parity; Chen et al., arXiv:2002.05709)."""

    def _augment_view(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        rng = self.rng
        # random resized crop (scale 0.2-1.0)
        scale = rng.uniform(0.2, 1.0)
        ar = rng.uniform(3 / 4, 4 / 3)
        cw = int(min(w, np.sqrt(w * h * scale * ar)))
        ch = int(min(h, np.sqrt(w * h * scale / ar)))
        x0 = int(rng.integers(0, max(w - cw, 1)))
        y0 = int(rng.integers(0, max(h - ch, 1)))
        view = cv2.resize(img[y0 : y0 + ch, x0 : x0 + cw], (w, h), interpolation=cv2.INTER_LINEAR)
        if rng.random() < 0.5:
            view = np.fliplr(view).copy()
        # color jitter (HSV approximation of SimCLR's jitter, strength 0.5)
        augment_hsv(view, rng, hgain=0.1, sgain=0.4, vgain=0.4)
        if rng.random() < 0.2:
            gray = cv2.cvtColor(view, cv2.COLOR_BGR2GRAY)
            view = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
        return np.ascontiguousarray(view)


class RLDataLoader:
    """Batches n_trans-view items image-major: (bs * n_trans, H, W, 3).

    Layout matches the reference collate (data_loader_repr.py:127-149):
    rows are [img0_v0, img0_v1, img1_v0, ...] — views interleave fastest,
    so RLLoss's even/odd pairing and InfoNCE's repeat(arange(bs), n_trans)
    ids both index the same image's views.
    """

    def __init__(self, dataset, batch_size: int = 16, shuffle: bool = False, seed: int = 0) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(order)
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idx = order[i : i + self.batch_size]
            items = [self.dataset[int(j)] for j in idx]
            views = np.stack([it[0] for it in items])  # (bs, n_trans, H, W, 3)
            batch = views.reshape(-1, *views.shape[2:])  # image-major interleave
            yield batch, [it[1] for it in items]
        self.epoch += 1


def crop_and_save_bboxes(img_dir: str, save_dir: str, min_size: int = 32) -> int:
    """Crop GT boxes >= min_size px to images (crop_bboxes.py:38-73 parity).

    Returns the number of crops written.
    """
    save = Path(save_dir)
    save.mkdir(parents=True, exist_ok=True)
    label_dir = Path(str(img_dir).replace("images", "labels"))
    n = 0
    for label_path in sorted(label_dir.glob("*.txt")):
        img_path = Path(str(label_path).replace("labels", "images")).with_suffix(".jpg")
        if not img_path.exists():
            continue
        img = cv2.imread(str(img_path))
        if img is None:
            continue
        h, w = img.shape[:2]
        for idx, line in enumerate(label_path.read_text().splitlines()):
            parts = line.split()
            if len(parts) < 5:
                continue
            _, cx, cy, bw, bh = map(float, parts[:5])
            x0, bw_px = int((cx - bw / 2) * w), int(bw * w)
            y0, bh_px = int((cy - bh / 2) * h), int(bh * h)
            if bw_px >= min_size and bh_px >= min_size:
                crop = img[max(y0, 0) : y0 + bh_px, max(x0, 0) : x0 + bw_px]
                out = save / f"{img_path.stem}_{idx:03d}.jpg"
                cv2.imwrite(str(out), crop)
                n += 1
    LOGGER.info("wrote %d box crops to %s", n, save_dir)
    return n

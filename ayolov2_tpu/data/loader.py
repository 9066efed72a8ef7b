"""Batching + prefetching loader feeding fixed-shape numpy batches.

Replaces the reference's torch DataLoader + collate_fn
(scripts/data_loader/data_loader_utils.py:27-120, data_loader.py:887-909)
with a thread-prefetched loader producing XLA-friendly batches:

  - images: (B, H, W, 3) uint8 NHWC (normalization happens on device —
    one H2D copy of bytes, not floats: 4x less PCIe/ICI traffic)
  - labels: (B * max_labels, 6) [img_idx, cls, x, y, w, h] + validity mask
    (fixed capacity -> single compiled train step shape)
  - per-host sharding: with ``shard=(index, count)`` each host iterates its
    1/count slice — the mesh-era replacement for DistributedSampler
    (data_loader_utils.py:101-103).

Workers are threads, not processes: cv2/numpy release the GIL for the heavy
ops and threads avoid fork+JAX issues.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ayolov2_tpu.loss.yolo_loss import pad_targets


class Batch:
    """One collated batch."""

    __slots__ = ("images", "targets", "target_mask", "paths", "shapes", "n_labels")

    def __init__(self, images, targets, target_mask, paths, shapes, n_labels):
        self.images = images
        self.targets = targets
        self.target_mask = target_mask
        self.paths = paths
        self.shapes = shapes
        self.n_labels = n_labels


def collate(items: Sequence, max_labels_per_image: int = 64) -> Batch:
    """Stack dataset items into one fixed-shape batch."""
    imgs, labels, paths, shapes = zip(*items)
    images = np.stack(imgs)  # (B, H, W, 3) uint8
    bs = len(items)
    targets, mask = pad_targets(labels, bs, bs * max_labels_per_image)
    n_labels = [len(lab) for lab in labels]
    return Batch(images, targets, mask, list(paths), list(shapes), n_labels)


class DataLoader:
    """Thread-prefetched batch iterator over an indexable dataset.

    Args:
        dataset: object with __len__/__getitem__ returning (img, labels,
            path, shapes) — DetectionDataset, or (img, orig, ratio_pad) for
            ImageFolderDataset (use ``detection=False``).
        batch_size: global batch is batch_size; with shard=(i, n) this loader
            yields batch_size // n per step from its slice.
        shuffle: reshuffle each epoch (seeded).
        drop_last: drop the trailing partial batch (train mode keeps shapes
            static; val mode pads the final batch instead).
        max_labels_per_image: label capacity per image for pad_targets.
        shard: (host_index, host_count) input sharding.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 16,
        shuffle: bool = False,
        drop_last: bool = False,
        workers: int = 2,
        max_labels_per_image: int = 64,
        shard: Tuple[int, int] = (0, 1),
        detection: bool = True,
        seed: int = 0,
        pad_final_batch: bool = True,
    ) -> None:
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.shard = shard
        self.batch_size = batch_size // shard[1]
        assert self.batch_size >= 1, "batch_size must be >= host count"
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(1, workers)
        self.max_labels = max_labels_per_image
        self.detection = detection
        self.seed = seed
        self.pad_final_batch = pad_final_batch
        self.epoch = 0
        self.sample_weights: Optional[np.ndarray] = None  # image-weighted resampling

    def __len__(self) -> int:
        n = len(self._host_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _host_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            if self.sample_weights is not None:
                # weighted image resampling (yolo_trainer.py:435-467 analogue)
                p = self.sample_weights / self.sample_weights.sum()
                order = rng.choice(n, size=n, replace=True, p=p)
            else:
                order = rng.permutation(n)
        idx, cnt = self.shard
        return order[idx::cnt]

    def __iter__(self) -> Iterator[Batch]:
        indices = self._host_indices()
        batches: List[np.ndarray] = [
            indices[i : i + self.batch_size] for i in range(0, len(indices), self.batch_size)
        ]
        if batches and len(batches[-1]) < self.batch_size:
            if self.drop_last:
                batches.pop()
            elif self.pad_final_batch and len(batches[-1]):
                short = self.batch_size - len(batches[-1])
                batches[-1] = np.concatenate([batches[-1], batches[-1][:1].repeat(short)])

        q: "queue.Queue" = queue.Queue(maxsize=self.workers * 2)
        stop = threading.Event()

        def produce():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    items = [self.dataset[int(i)] for i in b]
                    if self.detection:
                        q.put(collate(items, self.max_labels))
                    else:
                        imgs = np.stack([it[0] for it in items])
                        metas = [(it[1], it[2]) for it in items]
                        q.put((imgs, metas, [int(i) for i in b]))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
        self.epoch += 1

"""Batching + prefetching loader feeding fixed-shape numpy batches.

Replaces the reference's torch DataLoader + collate_fn
(scripts/data_loader/data_loader_utils.py:27-120, data_loader.py:887-909)
with a multi-worker thread-prefetched loader producing XLA-friendly batches:

  - images: (B, H, W, 3) uint8 NHWC (normalization happens on device —
    one H2D copy of bytes, not floats: 4x less PCIe/ICI traffic)
  - labels: (B * max_labels, 6) [img_idx, cls, x, y, w, h] + validity mask
    (fixed capacity -> single compiled train step shape)
  - per-host sharding: with ``shard=(index, count)`` each host iterates its
    1/count slice — the mesh-era replacement for DistributedSampler
    (data_loader_utils.py:101-103).
  - fixed-shape final batch: padded by repeating rows, with ``n_real``
    recording the true item count so consumers (validator, result writer)
    never double-count the padding (reference runs a short last batch —
    scripts/utils/train_utils.py:403-472 semantics preserved via n_real).

Workers default to THREADS (cv2/numpy release the GIL for the heavy ops and
threads avoid fork+JAX issues and result-pickling copies); an opt-in
``workers_mode="process"`` forks a worker pool instead — the reference's
multi-process torch DataLoader shape (data_loader_utils.py:96-116) — for
hosts where Python-side augmentation cost dominates and GIL contention
bites. ``workers=N`` builds N batches concurrently in either mode; ordered
reassembly keeps the epoch sequence deterministic regardless of which
worker finishes first. Thread-vs-process is measured head-to-head by
``cli/bench_loader.py``.
"""

from __future__ import annotations

import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ayolov2_tpu.loss.yolo_loss import pad_targets


class Batch:
    """One collated batch. ``n_real``: items before final-batch padding."""

    __slots__ = ("images", "targets", "target_mask", "paths", "shapes", "n_labels", "n_real")

    def __init__(self, images, targets, target_mask, paths, shapes, n_labels, n_real=None):
        self.images = images
        self.targets = targets
        self.target_mask = target_mask
        self.paths = paths
        self.shapes = shapes
        self.n_labels = n_labels
        self.n_real = len(paths) if n_real is None else n_real


def collate(items: Sequence, max_labels_per_image: int = 64, n_real: Optional[int] = None) -> Batch:
    """Stack dataset items into one fixed-shape batch."""
    imgs, labels, paths, shapes = zip(*items)
    images = np.stack(imgs)  # (B, H, W, 3) uint8
    bs = len(items)
    targets, mask = pad_targets(labels, bs, bs * max_labels_per_image)
    n_labels = [len(lab) for lab in labels]
    return Batch(images, targets, mask, list(paths), list(shapes), n_labels, n_real)


class DataLoader:
    """Multi-worker prefetched batch iterator over an indexable dataset.

    Args:
        dataset: object with __len__/__getitem__ returning (img, labels,
            path, shapes) — DetectionDataset, or (img, orig, ratio_pad) for
            ImageFolderDataset (use ``detection=False``).
        batch_size: global batch is batch_size; with shard=(i, n) this loader
            yields batch_size // n per step from its slice.
        shuffle: reshuffle each epoch (seeded).
        drop_last: drop the trailing partial batch (train mode keeps shapes
            static; val mode pads the final batch instead and reports n_real).
        workers: number of concurrent batch builders.
        workers_mode: "thread" (default) or "process" (forked worker pool,
            reference data_loader_utils.py:96-116 parity; results cross a
            pipe so each batch pays one pickle copy). Note: in process mode
            lazy ("dynamic") image-cache fills happen in the children and
            are lost at epoch end — pre-filled caches (``mem``/``disk``)
            are shared read-only via fork and work in both modes.
        max_labels_per_image: label capacity per image for pad_targets.
        shard: (host_index, host_count) input sharding.

    Yields Batch (detection=True) or (images, metas, indices, n_real)
    tuples (detection=False), where metas/indices are already truncated to
    the real items.
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
        workers_mode: str = "thread",
    ) -> None:
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.shard = shard
        self.batch_size = batch_size // shard[1]
        assert self.batch_size >= 1, "batch_size must be >= host count"
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(1, workers)
        if workers_mode not in ("thread", "process"):
            raise ValueError(f"workers_mode must be 'thread' or 'process', got {workers_mode!r}")
        self.workers_mode = workers_mode
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
        if cnt > 1 and len(order):
            # Equalize per-host lengths (DistributedSampler semantics): pad
            # the order to cnt*ceil(n/cnt) by wrapping so every host yields
            # the identical batch count — a host with one extra batch would
            # call the collective pjit step alone and deadlock the job, and
            # per-host steps_per_epoch (hence LR schedules) would diverge.
            per = -(-len(order) // cnt)
            total = per * cnt
            if total > len(order):
                order = np.concatenate([order, order[: total - len(order)]])
        return order[idx::cnt]

    def _build(self, b: np.ndarray, n_real: int, pos0: int = 0, stride: int = 1):
        get = getattr(self.dataset, "get_item", None)
        if get is not None:
            # epoch-position salt: repeated indices (weighted resampling)
            # must draw fresh augmentations (datasets._item_rng)
            items = [get(int(i), pos0 + stride * j) for j, i in enumerate(b)]
        else:
            items = [self.dataset[int(i)] for i in b]
        if self.detection:
            if getattr(self.dataset, "device_aug", False):
                from ayolov2_tpu.data.device_augment import collate_plans

                return collate_plans(items, len(b), self.max_labels, n_real=n_real)
            return collate(items, self.max_labels, n_real=n_real)
        imgs = np.stack([it[0] for it in items])
        metas = [(it[1], it[2]) for it in items[:n_real]]
        return (imgs, metas, [int(i) for i in b[:n_real]], n_real)

    def __iter__(self) -> Iterator:
        indices = self._host_indices()
        # the dataset derives per-item augmentation RNG from (seed, epoch,
        # index) — publish the epoch so draws vary across epochs yet stay
        # deterministic under concurrent workers
        try:
            self.dataset.epoch = self.epoch
        except AttributeError:
            pass
        batches: List[np.ndarray] = [
            indices[i : i + self.batch_size] for i in range(0, len(indices), self.batch_size)
        ]
        n_real: List[int] = [len(b) for b in batches]
        if batches and len(batches[-1]) < self.batch_size:
            if self.drop_last:
                batches.pop()
                n_real.pop()
            elif self.pad_final_batch and len(batches[-1]):
                short = self.batch_size - len(batches[-1])
                batches[-1] = np.concatenate([batches[-1], batches[-1][:1].repeat(short)])

        it = (
            self._iter_processes(batches, n_real)
            if self.workers_mode == "process"
            else self._iter_threads(batches, n_real)
        )
        yield from it
        self.epoch += 1

    def _pos0(self, i: int) -> int:
        # GLOBAL epoch-position salt (shard-unique): two hosts at the same
        # local position must not seed identical augmentation RNG for a
        # resampled duplicate index
        sidx, scnt = self.shard
        return sidx + scnt * (i * self.batch_size)

    def _iter_threads(self, batches: List[np.ndarray], n_real: List[int]) -> Iterator:
        n_batches = len(batches)
        results: dict = {}
        errors: List[BaseException] = []
        cond = threading.Condition()
        stop = threading.Event()
        next_task = [0]
        # bound how far workers run ahead of the consumer (memory cap)
        max_ahead = 2 * self.workers

        def worker():
            while not stop.is_set():
                with cond:
                    while not stop.is_set():
                        i = next_task[0]
                        if i >= n_batches:
                            return
                        if len(results) < max_ahead or not results:
                            next_task[0] = i + 1
                            break
                        cond.wait(0.1)
                    else:
                        return
                try:
                    built = self._build(
                        batches[i], n_real[i], pos0=self._pos0(i), stride=self.shard[1]
                    )
                except BaseException as e:  # propagate to the consumer
                    with cond:
                        errors.append(e)
                        stop.set()
                        cond.notify_all()
                    return
                with cond:
                    results[i] = built
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True, name=f"loader-w{k}")
            for k in range(min(self.workers, max(n_batches, 1)))
        ]
        for t in threads:
            t.start()
        try:
            for i in range(n_batches):
                with cond:
                    while i not in results and not errors:
                        cond.wait(0.1)
                    if errors:
                        raise errors[0]
                    item = results.pop(i)
                    cond.notify_all()
                yield item
        finally:
            stop.set()
            with cond:
                cond.notify_all()

    def _iter_processes(self, batches: List[np.ndarray], n_real: List[int]) -> Iterator:
        """Forked worker-pool epoch (reference data_loader_utils.py:96-116
        parity). Fork is per-epoch so workers see the current dataset epoch
        and caches via copy-on-write; each finished batch crosses a pipe
        (one pickle copy) and is reassembled in order by the consumer."""
        import multiprocessing as mp

        n_batches = len(batches)
        if n_batches == 0:
            return
        ctx = mp.get_context("fork")
        n_workers = min(self.workers, n_batches)
        max_ahead = 2 * self.workers
        task_q: "mp.Queue" = ctx.Queue()
        result_q: "mp.Queue" = ctx.Queue()

        def worker() -> None:
            while True:
                i = task_q.get()
                if i is None:
                    return
                try:
                    built = self._build(
                        batches[i], n_real[i], pos0=self._pos0(i), stride=self.shard[1]
                    )
                    result_q.put((i, built))
                except BaseException as e:  # surface in the consumer
                    try:
                        result_q.put((i, _WorkerError(e)))
                    except Exception:
                        result_q.put((i, _WorkerError(RuntimeError(repr(e)))))
                    return

        procs = [ctx.Process(target=worker, daemon=True, name=f"loader-p{k}") for k in range(n_workers)]
        for p in procs:
            p.start()
        try:
            issued = min(max_ahead, n_batches)
            for i0 in range(issued):
                task_q.put(i0)
            buffered: dict = {}
            for i in range(n_batches):
                while i not in buffered:
                    j, built = result_q.get()
                    if isinstance(built, _WorkerError):
                        raise built.error
                    buffered[j] = built
                if issued < n_batches:
                    task_q.put(issued)
                    issued += 1
                yield buffered.pop(i)
        finally:
            for _ in procs:
                try:
                    task_q.put(None)
                except Exception:
                    pass
            for p in procs:
                p.join(timeout=2.0)
                if p.is_alive():
                    p.terminate()


class _WorkerError:
    """Pickle-safe exception envelope for the process-mode result pipe."""

    def __init__(self, error: BaseException) -> None:
        try:
            import pickle

            pickle.dumps(error)
            self.error = error
        except Exception:
            self.error = RuntimeError(repr(error))

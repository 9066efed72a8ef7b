"""Data pipeline tests against the real fixture datasets.

Uses the reference repo's checked-in mini VOC/COCO datasets (read-only mount)
— the same fixture pattern as the reference's tests (SURVEY §4).
"""

from pathlib import Path

import numpy as np
import pytest

from ayolov2_tpu.data import DataLoader, DetectionDataset, ImageFolderDataset
from ayolov2_tpu.data.datasets import letterbox, _parse_label_file, _img2label_path

VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"
COCO_VAL = "/root/reference/tests/res/datasets/coco/images/val2017"

pytestmark = pytest.mark.skipif(not Path(VOC_TRAIN).exists(), reason="fixture datasets unavailable")


def test_letterbox_geometry():
    im = np.zeros((480, 640, 3), np.uint8)
    out, ratio, (dw, dh) = letterbox(im, (640, 640), auto=False)
    assert out.shape == (640, 640, 3)
    assert ratio == (1.0, 1.0)
    assert (dw, dh) == (0.0, 80.0)
    # auto mode pads only to stride multiple
    out2, _, _ = letterbox(im, (640, 640), auto=True, stride=32)
    assert out2.shape == (480, 640, 3)
    # scale_up=False never enlarges
    small = np.zeros((100, 100, 3), np.uint8)
    out3, r3, _ = letterbox(small, (640, 640), auto=False, scale_up=False)
    assert r3 == (1.0, 1.0)


def test_label_path_mapping():
    p = _img2label_path("/data/images/train/img1.jpg", "labels")
    assert str(p) == "/data/labels/train/img1.txt"
    p = _img2label_path("/data/images/train/img1.jpg", "segments")
    assert str(p) == "/data/segments/train/img1.txt"


def test_image_folder_dataset():
    ds = ImageFolderDataset(VOC_TRAIN, img_size=320, batch_size=8, rect=False)
    assert len(ds) > 50
    img, (h0, w0), (ratio, pad) = ds[0]
    assert img.shape == (320, 320, 3)
    assert img.dtype == np.uint8
    assert h0 > 0 and w0 > 0


def test_image_folder_meta_descales_to_native():
    """The meta ratio must be the TOTAL native->letterbox content scale so
    scale_coords lands back in native pixels (caught by the answersheet
    golden: the letterbox-step-only ratio left val2 boxes un-descaled)."""
    from ayolov2_tpu.utils.boxes import scale_coords

    ds = ImageFolderDataset(VOC_TRAIN, img_size=320, batch_size=8, rect=False)
    # find a non-square image (the fixture VOC is full of 500x375s)
    idx = next(i for i in range(len(ds)) if ds.shapes[i][0] != ds.shapes[i][1])
    img, (h0, w0), (ratio, pad) = ds[idx]
    assert h0 != w0
    r = 320 / max(h0, w0)
    np.testing.assert_allclose(ratio, (int(h0 * r) / h0, int(w0 * r) / w0), rtol=1e-6)
    # a letterboxed box spanning the full content must descale to ~(w0, h0)
    content = np.array([[pad[0], pad[1], pad[0] + w0 * ratio[1], pad[1] + h0 * ratio[0]]])
    back = scale_coords(img.shape[:2], content.astype(np.float64), (h0, w0), (ratio, pad))
    np.testing.assert_allclose(back[0], [0, 0, w0, h0], atol=1.0)


def test_rect_batching_shapes():
    ds = ImageFolderDataset(VOC_TRAIN, img_size=320, batch_size=8, rect=True, pad=0.5)
    shapes = ds.batch_shapes
    assert (shapes % 32 == 0).all()
    img, _, _ = ds[0]
    want = tuple(ds.batch_shapes[ds.batch_idx[0]])
    assert img.shape[:2] == want


def test_detection_dataset_no_augment():
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=4)
    img, labels, path, shapes = ds[0]
    assert img.shape == (320, 320, 3)
    assert labels.ndim == 2 and labels.shape[1] == 5
    if len(labels):
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1.001).all()
    (h0, w0), (r, pad) = shapes
    assert h0 > 0


def test_detection_dataset_mosaic_augment():
    aug = {
        "augment": True, "mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0,
        "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0, "perspective": 0.0,
    }
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=4, yolo_augmentation=aug, seed=3)
    for i in range(3):
        img, labels, _, _ = ds[i]
        assert img.shape == (320, 320, 3)
        if len(labels):
            assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1.001).all()


def test_coco_segments_parsing():
    seg_dir = Path("/root/reference/tests/res/datasets/coco/segments/val2017")
    files = sorted(seg_dir.glob("*.txt"))[:5]
    for f in files:
        labels, segments = _parse_label_file(f)
        assert labels.shape[1] == 5
        assert len(segments) == len(labels)
        for s in segments:
            assert s.ndim == 2 and s.shape[1] == 2


def test_coco_dataset_with_segments_and_copy_paste():
    aug = {
        "augment": True, "mosaic": 1.0, "copy_paste": 0.5,
        "translate": 0.1, "scale": 0.5,
    }
    ds = DetectionDataset(
        COCO_VAL, img_size=256, batch_size=4, label_type="segments",
        yolo_augmentation=aug, seed=0,
    )
    img, labels, _, _ = ds[0]
    assert img.shape == (256, 256, 3)


def test_dataloader_fixed_shapes():
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=4)
    dl = DataLoader(ds, batch_size=4, shuffle=True, workers=2, max_labels_per_image=32)
    n = 0
    for batch in dl:
        assert batch.images.shape == (4, 320, 320, 3)
        assert batch.images.dtype == np.uint8
        assert batch.targets.shape == (4 * 32, 6)
        assert batch.target_mask.shape == (4 * 32,)
        # image indices of valid targets in range
        if batch.target_mask.any():
            assert batch.targets[batch.target_mask, 0].max() < 4
        n += 1
        if n >= 3:
            break
    assert n == 3


def test_dataloader_sharding():
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=8)
    dl0 = DataLoader(ds, batch_size=8, shard=(0, 2), drop_last=True)
    dl1 = DataLoader(ds, batch_size=8, shard=(1, 2), drop_last=True)
    assert dl0.batch_size == 4
    b0 = next(iter(dl0))
    b1 = next(iter(dl1))
    assert set(b0.paths).isdisjoint(set(b1.paths))


def test_dataloader_deterministic_with_seed():
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=4)
    paths1 = [b.paths for b in DataLoader(ds, batch_size=4, shuffle=True, seed=7)]
    paths2 = [b.paths for b in DataLoader(ds, batch_size=4, shuffle=True, seed=7)]
    assert paths1 == paths2


def test_dataloader_multiworker_matches_single():
    """VERDICT r1: multi-worker loader — same batches, same order, regardless
    of worker count (ordered reassembly + per-item RNG)."""
    ds = DetectionDataset(
        VOC_TRAIN, img_size=320, batch_size=4,
        yolo_augmentation={"augment": True, "mosaic": 1.0, "hsv_h": 0.015,
                           "hsv_s": 0.7, "hsv_v": 0.4, "translate": 0.1, "scale": 0.5},
    )
    out = {}
    for workers in (1, 4):
        ds.epoch = 0
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=3, workers=workers)
        out[workers] = [(b.paths, b.images.copy(), b.targets.copy()) for b in dl]
    assert len(out[1]) == len(out[4]) > 0
    for (p1, i1, t1), (p4, i4, t4) in zip(out[1], out[4]):
        assert p1 == p4
        np.testing.assert_array_equal(i1, i4)
        np.testing.assert_array_equal(t1, t4)


def test_dataloader_process_mode_matches_thread():
    """VERDICT r3 task 4: the opt-in forked worker pool (reference
    data_loader_utils.py:96-116 parity) must produce bit-identical batches
    in the identical order as the default thread pool."""
    ds = DetectionDataset(
        VOC_TRAIN, img_size=320, batch_size=4,
        yolo_augmentation={"augment": True, "mosaic": 1.0, "hsv_h": 0.015,
                           "hsv_s": 0.7, "hsv_v": 0.4, "translate": 0.1, "scale": 0.5},
    )
    out = {}
    for mode in ("thread", "process"):
        ds.epoch = 0
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=3, workers=3,
                        workers_mode=mode)
        out[mode] = [(b.paths, b.images.copy(), b.targets.copy()) for b in dl]
    assert len(out["thread"]) == len(out["process"]) > 0
    for (p1, i1, t1), (p2, i2, t2) in zip(out["thread"], out["process"]):
        assert p1 == p2
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(t1, t2)


def test_dataloader_process_mode_propagates_errors():
    """A worker-process exception must surface in the consumer, not hang."""

    class _Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("boom-item")

    dl = DataLoader(_Boom(), batch_size=4, workers=2, workers_mode="process")
    with pytest.raises(RuntimeError, match="boom-item"):
        list(dl)


def test_dataloader_final_batch_n_real():
    """Padded final batch keeps static shapes but reports the true count."""
    ds = DetectionDataset(VOC_TRAIN, img_size=320, batch_size=3)
    n = len(ds)
    dl = DataLoader(ds, batch_size=3, shuffle=False)
    batches = list(dl)
    assert sum(b.n_real for b in batches) == n
    last = batches[-1]
    assert last.images.shape[0] == 3  # still padded to full batch
    if n % 3:
        assert last.n_real == n % 3


def test_repeated_index_salt_fresh_augmentations():
    """Weighted image resampling repeats indices within an epoch; the
    epoch-position salt must give each occurrence fresh augmentation draws
    (identical draws would defeat the oversampling), while the same
    (index, salt) stays deterministic."""
    from ayolov2_tpu.data.datasets import DetectionDataset

    hyp = {"augment": True, "mosaic": 1.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "translate": 0.1, "scale": 0.5}
    ds = DetectionDataset(VOC_TRAIN, img_size=128, batch_size=4,
                          yolo_augmentation=hyp)
    a = ds.get_item(0, 0)[0]
    b = ds.get_item(0, 1)[0]
    c = ds.get_item(0, 0)[0]
    assert (a != b).any(), "same index at different epoch positions: identical sample"
    assert (a == c).all(), "same (index, salt) must be deterministic"


def test_dataloader_shard_equal_batch_counts():
    """Per-host batch counts must be IDENTICAL for any dataset length
    (DistributedSampler pad-by-wrap semantics): a host with one extra batch
    would enter the collective pjit step alone and deadlock, and per-host
    steps_per_epoch/LR schedules would diverge (ADVICE r2 medium)."""

    class _Stub:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            img = np.zeros((32, 32, 3), np.uint8)
            return img, np.zeros((0, 5), np.float32), f"p{i}", ((32, 32), ((1, 1), (0, 0)))

    for n, hosts, gbs in [(15, 2, 8), (17, 4, 8), (9, 2, 4), (7, 3, 3)]:
        lens = []
        seen = set()
        for h in range(hosts):
            dl = DataLoader(_Stub(n), batch_size=gbs, shard=(h, hosts),
                            drop_last=True, shuffle=True, seed=3)
            batches = list(dl)
            lens.append(len(batches))
            assert len(batches) == len(dl)
            for b in batches:
                seen.update(b.paths)
        assert len(set(lens)) == 1, (n, hosts, gbs, lens)
        # wrap-padding may duplicate a few items but must not invent any
        assert seen <= {f"p{i}" for i in range(n)}

"""More direct parity vs the reference's own code: NMS keep-sets, IoU
variants, letterbox geometry, deterministic augmentation warps.

The torchvision stub here implements real ``ops.nms`` / ``ops.boxes.
batched_nms`` semantics in torch so the reference NMS paths execute
faithfully.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = "/root/reference"
VOC_VAL = "/root/reference/tests/res/datasets/VOC/images/val"
pytestmark = pytest.mark.skipif(not Path(REF).exists(), reason="reference unavailable")


@pytest.fixture(scope="module")
def ref_modules():
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)

    def _box_iou_t(a, b):
        area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area1[:, None] + area2[None, :] - inter)

    def _nms(boxes, scores, iou_threshold):
        """torchvision.ops.nms semantics: greedy by score, suppress IoU > thr,
        return kept indices in score order."""
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            ious = _box_iou_t(boxes[i : i + 1], boxes[order[1:]])[0]
            order = order[1:][ious <= iou_threshold]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    def _batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        offset = idxs.to(boxes) * (boxes.max() + 1)
        return _nms(boxes + offset[:, None], scores, iou_threshold)

    # ALWAYS upgrade the existing stub module object in place: the reference
    # modules bind `import torchvision` at their first import (possibly from
    # another test file's barer stub), so replacing sys.modules would leave
    # their cached binding without .ops.nms (AttributeError under full-suite
    # ordering).
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "ops"):
        tv.ops = types.ModuleType("torchvision.ops")
    sys.modules["torchvision.ops"] = tv.ops
    tv.ops.nms = _nms
    tv.ops.boxes = types.SimpleNamespace(batched_nms=_batched_nms)
    if "kindle" not in sys.modules:
        kindle = types.ModuleType("kindle")
        kindle.YOLOModel = object
        sys.modules["kindle"] = kindle
    if "p_tqdm" not in sys.modules:
        pt = types.ModuleType("p_tqdm")
        pt.p_map = lambda f, xs, **k: list(map(f, xs))
        sys.modules["p_tqdm"] = pt

    import scripts.utils.metrics as ref_metrics  # noqa: E402
    import scripts.utils.nms as ref_nms  # noqa: E402
    import scripts.augmentation.yolo_augmentation as ref_aug  # noqa: E402

    return ref_metrics, ref_nms, ref_aug


def _fake_decoded(bs=2, n=200, nc=5, seed=0):
    """Plausible decoded predictions (bs, n, 5+nc): xywh pixels, obj, cls."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(50, 600, (bs, n, 2))
    wh = rng.uniform(10, 120, (bs, n, 2))
    obj = rng.uniform(0, 1, (bs, n, 1))
    cls = rng.uniform(0, 1, (bs, n, nc))
    return np.concatenate([xy, wh, obj, cls], -1).astype(np.float32)


@pytest.mark.parametrize("nms_type", ["nms", "fast_nms", "matrix_nms"])
def test_batched_nms_keep_set_parity(ref_modules, nms_type):
    """Same kept (box, score, class) sets as the reference's batched_nms
    (scripts/utils/nms.py:15-116).

    NOTE the reference nms.py flag inversion: ITS agnostic=True applies the
    per-class offset; ours follows the standard convention (metrics.py's),
    so reference agnostic=True == ours agnostic=False.
    """
    import torch

    _, ref_nms, _ = ref_modules
    from ayolov2_tpu.ops.nms import batched_nms, detections_to_list

    pred = _fake_decoded()
    bs, n, no = pred.shape
    nc = no - 5
    conf, iou = 0.3, 0.5

    ref_out = ref_nms.batched_nms(
        torch.tensor(pred), conf_thres=conf, iou_thres=iou, nms_box=n,
        agnostic=True, nms_type=nms_type,
    )

    det, n_valid = batched_nms(
        pred, conf_thres=conf, iou_thres=iou, nms_box=n,
        pre_top_k=n * nc, keep_top_k=n * nc, agnostic=False, multi_label=True,
        nms_type=nms_type,
    )
    ours = detections_to_list(np.asarray(det), np.asarray(n_valid))

    for i in range(bs):
        ref_i = ref_out[i].numpy()
        got_i = ours[i]
        if nms_type == "matrix_nms":
            # matrix nms keeps everything with gaussian-decayed scores; the
            # decay's triu mask depends on candidate ORDER (reference:
            # obj-order; ours: score-order), so individual decays drift a
            # few percent — compare the top-20 decayed scores loosely and
            # the kept count exactly
            assert len(got_i) == len(ref_i)
            ref_scores = np.sort(ref_i[:, 4])[::-1][:20]
            got_scores = np.sort(got_i[:, 4])[::-1][:20]
            np.testing.assert_allclose(got_scores, ref_scores, rtol=5e-2)
            continue
        if nms_type == "fast_nms":
            # the reference's fast_nms suppression priority is candidate
            # ORDER (obj-sorted boxes x class), not confidence — ours uses
            # the canonical YOLACT score order. Keep-sets agree on all but
            # order-sensitive ties: require >= 97% overlap.
            ref_set = {(round(s, 4), int(c)) for s, c in zip(ref_i[:, 4], ref_i[:, 5])}
            got_set = {(round(s, 4), int(c)) for s, c in zip(got_i[:, 4], got_i[:, 5])}
            overlap = len(ref_set & got_set) / max(len(ref_set | got_set), 1)
            assert overlap >= 0.97, (i, overlap)
            continue
        assert len(got_i) == len(ref_i), (nms_type, i, len(got_i), len(ref_i))
        ref_sorted = ref_i[np.argsort(-ref_i[:, 4])]
        got_sorted = got_i[np.argsort(-got_i[:, 4])]
        np.testing.assert_allclose(got_sorted[:, 4], ref_sorted[:, 4], rtol=1e-5)
        np.testing.assert_allclose(got_sorted[:, :4], ref_sorted[:, :4], rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(got_sorted[:, 5], ref_sorted[:, 5])


def test_bbox_iou_variants_parity(ref_modules):
    import torch

    ref_metrics, _, _ = ref_modules
    from ayolov2_tpu.utils.boxes import bbox_iou

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:]) * 0.3 + 1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) * 0.3 + 1

    for kind in ("plain", "giou", "diou", "ciou"):
        kw = {"g_iou": kind == "giou", "d_iou": kind == "diou", "c_iou": kind == "ciou"}
        ref = ref_metrics.bbox_iou(torch.tensor(a).T, torch.tensor(b), x1y1x2y2=True, **kw)
        got = bbox_iou(a, b, x1y1x2y2=True, **kw)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not Path(VOC_VAL).exists(), reason="fixtures unavailable")
def test_letterbox_geometry_parity(ref_modules):
    """Same resize ratio, padding, and output pixels as LoadImages._letterbox."""
    import cv2

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from scripts.data_loader.data_loader import LoadImages  # noqa: E402

    from ayolov2_tpu.data.datasets import letterbox

    ref_ds = LoadImages(VOC_VAL, img_size=320, batch_size=4, rect=False, n_skip=10)
    img_path = ref_ds.img_files[0]
    im = cv2.imread(img_path)

    for shape, auto in (((320, 320), False), ((320, 320), True), ((256, 320), False)):
        r = im.copy()
        scale = 320 / max(r.shape[:2])
        r = cv2.resize(r, (int(r.shape[1] * scale), int(r.shape[0] * scale)))
        ref_img, ref_ratio, ref_pad = ref_ds._letterbox(r.copy(), new_shape=shape, auto=auto)
        got_img, got_ratio, got_pad = letterbox(r.copy(), shape, auto=auto, scale_up=True)
        assert got_img.shape == ref_img.shape, (shape, auto)
        np.testing.assert_allclose(got_ratio, ref_ratio)
        np.testing.assert_allclose(got_pad, ref_pad)
        np.testing.assert_array_equal(got_img, ref_img)


def test_random_perspective_deterministic_parity(ref_modules):
    """With all randomness amplitudes at zero the warp is deterministic —
    outputs must match exactly (geometry + box filtering)."""
    _, _, ref_aug = ref_modules
    from ayolov2_tpu.data.augment import random_perspective

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (128, 160, 3), dtype=np.uint8)
    targets = np.array(
        [[0, 20.0, 30.0, 80.0, 90.0], [1, 100.0, 50.0, 150.0, 120.0]], np.float32
    )
    ref_img, ref_t = ref_aug.random_perspective(
        img.copy(), targets.copy(), degrees=0, translate=0, scale=0, shear=0,
        perspective=0.0, border=(0, 0),
    )
    got_img, got_t = random_perspective(
        img.copy(), targets.copy(), np.random.default_rng(0), degrees=0,
        translate=0, scale=0, shear=0, perspective=0.0, border=(0, 0),
    )
    np.testing.assert_array_equal(got_img, ref_img)
    np.testing.assert_allclose(got_t, ref_t, atol=1e-4)


def test_bbox_ioa_parity(ref_modules):
    ref_metrics, _, _ = ref_modules
    from ayolov2_tpu.utils.boxes import bbox_ioa

    rng = np.random.default_rng(3)
    b1 = rng.uniform(0, 100, 4)
    b1[2:] = b1[:2] + 50
    b2 = rng.uniform(0, 100, (20, 4))
    b2[:, 2:] = b2[:, :2] + rng.uniform(5, 60, (20, 2))
    ref = ref_metrics.bbox_ioa(b1, b2)
    got = bbox_ioa(b1, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("multi_label", [False, True])
def test_non_max_suppression_parity(ref_modules, multi_label):
    """The val-path NMS (metrics.py:285-443) vs non_max_suppression_np —
    exact keep-sets for the 'nms' type, with and without hybrid labels."""
    import torch

    ref_metrics, _, _ = ref_modules
    from ayolov2_tpu.ops.nms import non_max_suppression_np

    pred = _fake_decoded(bs=2, n=150, nc=4, seed=7)
    conf, iou = 0.25, 0.5

    labels = [
        np.array([[1, 300.0, 300.0, 80.0, 60.0]], np.float32),
        np.zeros((0, 5), np.float32),
    ]

    for use_labels in (False, True):
        ref_labels = [torch.tensor(lb) for lb in labels] if use_labels else ()
        ref_out = ref_metrics.non_max_suppression(
            torch.tensor(pred.copy()), conf_thres=conf, iou_thres=iou,
            multi_label=multi_label, labels=ref_labels, max_det=300, nms_type="nms",
        )
        got_out = non_max_suppression_np(
            pred.copy(), conf_thres=conf, iou_thres=iou, multi_label=multi_label,
            labels=labels if use_labels else (), max_det=300, nms_type="nms",
            pre_top_k=150 * 4 + 4,
        )
        for i in range(2):
            ref_i = ref_out[i].numpy()
            got_i = got_out[i]
            assert len(got_i) == len(ref_i), (multi_label, use_labels, i, len(got_i), len(ref_i))
            ref_sorted = ref_i[np.argsort(-ref_i[:, 4])]
            got_sorted = got_i[np.argsort(-got_i[:, 4])]
            np.testing.assert_allclose(got_sorted[:, 4], ref_sorted[:, 4], rtol=1e-5)
            np.testing.assert_allclose(got_sorted[:, :4], ref_sorted[:, :4], rtol=1e-4, atol=1e-2)
            np.testing.assert_array_equal(got_sorted[:, 5], ref_sorted[:, 5])


def test_tta_descale_clip_parity(ref_modules):
    """descale_pred + clip_augmented vs the reference tta_utils (torch).

    Flip-code mapping: reference 2=up-down, 3=left-right (torch dim codes);
    ours 1=up-down, 2=left-right (NHWC axis codes).
    """
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import scripts.utils.tta_utils as ref_tta

    from ayolov2_tpu.ops.tta import clip_augmented, descale_pred

    rng = np.random.default_rng(9)
    pred = rng.uniform(0, 640, (2, 50, 25)).astype(np.float32)
    for ref_flip, our_flip in ((None, None), (2, 1), (3, 2)):
        ref_out = ref_tta.descale_pred(torch.tensor(pred.copy()), ref_flip, 0.83, (640, 640))
        got_out = descale_pred(pred.copy(), our_flip, 0.83, (640, 640))
        np.testing.assert_allclose(np.asarray(got_out), ref_out.numpy(), rtol=1e-6)

    class _Head:
        nl = 3

    class _Model:
        model = [None, _Head()]

    n = 3 * (6400 + 1600 + 400)
    ys_ref = [torch.zeros((1, n, 25)) for _ in range(3)]
    ys_got = [np.zeros((1, n, 25), np.float32) for _ in range(3)]
    ref_clipped = ref_tta.clip_augmented(_Model(), ys_ref)
    got_clipped = clip_augmented(list(ys_got), nl=3, grid_points=None)
    for r, g in zip(ref_clipped, got_clipped):
        assert tuple(r.shape) == tuple(np.asarray(g).shape)

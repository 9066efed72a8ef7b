"""Metrics tests: AP math, TP matching, standalone COCO evaluator."""

import numpy as np
import pytest

from ayolov2_tpu.utils.metrics import (
    COCOmAPEvaluator,
    ConfusionMatrix,
    IOUV,
    ap_per_class,
    compute_ap,
    process_batch,
)


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0, abs=0.01)


def test_compute_ap_half():
    # one TP then one FP: recall [0.5, 0.5], precision [1.0, 0.5].
    # The envelope + trapezoid integration yields 0.5 (perfect half) plus the
    # declining tail 0.5->0 over recall 0.5->1: 0.5 + 0.125 = 0.625.
    ap, _, _ = compute_ap(np.array([0.5, 0.5]), np.array([1.0, 0.5]))
    assert ap == pytest.approx(0.6225, abs=0.01)


def test_process_batch_exact_match():
    det = np.array([[0, 0, 10, 10, 0.9, 1]], np.float64)
    lab = np.array([[1, 0, 0, 10, 10]], np.float64)
    correct = process_batch(det, lab)
    assert correct.shape == (1, 10)
    assert correct.all()  # IoU 1.0 passes every threshold


def test_process_batch_class_mismatch():
    det = np.array([[0, 0, 10, 10, 0.9, 2]], np.float64)
    lab = np.array([[1, 0, 0, 10, 10]], np.float64)
    assert not process_batch(det, lab).any()


def test_process_batch_unique_label_claim():
    # two detections on one label: only the higher-IoU one is TP
    det = np.array(
        [[0, 0, 10, 10, 0.9, 1], [1, 1, 11, 11, 0.8, 1]], np.float64
    )
    lab = np.array([[1, 0, 0, 10, 10]], np.float64)
    correct = process_batch(det, lab)
    assert correct[0, 0] and not correct[1, 0]


def test_ap_per_class_perfect():
    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    cls = np.zeros(n)
    tcls = np.zeros(n)
    p, r, ap, f1, uc = ap_per_class(tp, conf, cls, tcls)
    assert ap.shape == (1, 10)
    assert ap.mean() == pytest.approx(1.0, abs=0.02)


def test_ap_per_class_half_recall():
    # 10 labels, 5 TP detections
    tp = np.ones((5, 10), bool)
    conf = np.linspace(0.9, 0.5, 5)
    p, r, ap, f1, uc = ap_per_class(tp, conf, np.zeros(5), np.zeros(10))
    # 101-pt interp with precision 1.0 up to recall 0.5 and a linear tail to
    # (1, 0): 0.5 + 0.25 = 0.75 (matches the reference algorithm exactly)
    assert ap[:, 0].mean() == pytest.approx(0.75, abs=0.02)


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=3)
    det = np.array([[0, 0, 10, 10, 0.9, 1], [20, 20, 30, 30, 0.9, 2]], np.float64)
    lab = np.array([[1, 0, 0, 10, 10]], np.float64)
    cm.process_batch(det, lab)
    assert cm.matrix[1, 1] == 1  # correct class 1
    assert cm.matrix[2, 3] == 1  # class-2 det on background


def _mini_gt():
    return {
        "images": [{"id": 1, "width": 100, "height": 100}, {"id": 2, "width": 100, "height": 100}],
        "categories": [{"id": 1, "name": "a"}, {"id": 3, "name": "b"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "area": 900, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40], "area": 1600, "iscrowd": 0},
        ],
    }


def test_coco_evaluator_perfect():
    ev = COCOmAPEvaluator(_mini_gt())
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    res = ev.evaluate(preds)
    assert res["map50"] == pytest.approx(1.0, abs=0.01)
    assert res["map50_95"] == pytest.approx(1.0, abs=0.01)


def test_coco_evaluator_miss_and_fp():
    ev = COCOmAPEvaluator(_mini_gt())
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        # class 3 GT missed entirely; plus an FP for class 1
        {"image_id": 2, "category_id": 1, "bbox": [60, 60, 10, 10], "score": 0.8},
    ]
    res = ev.evaluate(preds)
    # class 1: 1 of 2 found with an FP after it -> AP50 = 0.5; class 3: 0
    assert res["map50"] == pytest.approx(0.25, abs=0.03)


def test_coco_evaluator_localization_quality():
    ev = COCOmAPEvaluator(_mini_gt())
    # IoU ~0.58 box for image-1 class-1 GT: counts at IoU .5/.55 only
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [13, 13, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    res = ev.evaluate(preds)
    assert res["map50"] == pytest.approx(1.0, abs=0.01)
    assert res["map50_95"] < 0.9


def test_coco_evaluator_yolo_id_fixmap():
    ev = COCOmAPEvaluator(_mini_gt(), cat_from_yolo=True)
    # YOLO class 0 -> COCO id 1, YOLO class 2 -> COCO id 3
    preds = [
        {"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 0, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    res = ev.evaluate(preds)
    assert res["map50"] == pytest.approx(1.0, abs=0.01)


def test_coco_evaluator_crowd_ignored():
    gt = _mini_gt()
    gt["annotations"].append(
        {"id": 4, "image_id": 2, "category_id": 1, "bbox": [50, 50, 40, 40], "area": 1600, "iscrowd": 1}
    )
    ev = COCOmAPEvaluator(gt)
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.95},
        # matches only the crowd region -> ignored, not an FP
        {"image_id": 2, "category_id": 1, "bbox": [55, 55, 30, 30], "score": 0.7},
    ]
    res = ev.evaluate(preds)
    assert res["map50"] == pytest.approx(1.0, abs=0.01)


def test_check_correct_prediction_by_iou_matches_reference():
    """Parity vs scripts/utils/metrics.py:551-600 (det-only dedup, strict >)."""
    import sys
    from pathlib import Path

    if not Path("/root/reference").exists():
        import pytest

        pytest.skip("reference unavailable")
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.ModuleType("torchvision.ops")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops
    sys.path.insert(0, "/root/reference")
    try:
        import torch

        from scripts.utils.metrics import (
            check_correct_prediction_by_iou as ref_fn,
        )
    finally:
        sys.path.remove("/root/reference")
    from ayolov2_tpu.utils.metrics import check_correct_prediction_by_iou

    rng = np.random.default_rng(0)
    for _ in range(5):
        n, m = rng.integers(1, 12), rng.integers(1, 8)
        det = np.zeros((n, 6), np.float32)
        xy = rng.uniform(0, 80, (n, 2))
        det[:, :2] = xy
        det[:, 2:4] = xy + rng.uniform(5, 30, (n, 2))
        det[:, 4] = rng.uniform(size=n)
        det[:, 5] = rng.integers(0, 3, n)
        lab = np.zeros((m, 5), np.float32)
        lxy = rng.uniform(0, 80, (m, 2))
        lab[:, 0] = rng.integers(0, 3, m)
        lab[:, 1:3] = lxy
        lab[:, 3:5] = lxy + rng.uniform(5, 30, (m, 2))

        ours = check_correct_prediction_by_iou(det, lab)
        ref = ref_fn(torch.from_numpy(det), torch.from_numpy(lab)).numpy()
        np.testing.assert_array_equal(ours, ref.astype(bool))


def test_coco_evaluator_per_class_report(tmp_path):
    """evaluate_per_class: per-class rollup + tabulate report + debug render
    (reference metrics.py:649-880)."""
    import cv2

    img_root = tmp_path / "imgs"
    export_root = tmp_path / "export"
    img_root.mkdir()
    for img_id in (1, 2):
        cv2.imwrite(str(img_root / f"{img_id:012d}.jpg"), np.full((100, 100, 3), 200, np.uint8))

    ev = COCOmAPEvaluator(_mini_gt(), img_root=str(img_root), export_root=str(export_root))
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 3, "bbox": [50, 50, 30, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.95},
    ]
    res = ev.evaluate_per_class(preds, debug=True)
    assert res["map50"] == pytest.approx(1.0, abs=0.01)
    assert res["mp"] == pytest.approx(1.0, abs=0.01)
    assert list(res["target_histogram"]) == [2, 1]
    # debug renders written (side-by-side pred|GT)
    assert (export_root / f"{1:012d}.jpg").exists()
    assert (export_root / f"{2:012d}.jpg").exists()
    assert (export_root / "confusion_matrix.png").exists()


def test_print_result_sparse_class_alignment():
    """Per-class report rows must land on the right class names when some
    classes have no GT (ap_per_class emits rows only for present classes) —
    regression for the positional-padding misattribution."""
    names = [f"c{i}" for i in range(5)]
    result = {
        "names": names,
        "ap_class": np.array([1, 3]),          # only classes 1 and 3 in GT
        "p": np.array([0.8, 0.6]), "r": np.array([0.7, 0.5]),
        "f1": np.array([0.74, 0.54]),
        "ap50": np.array([0.9, 0.4]), "ap": np.array([0.5, 0.2]),
        "mp": 0.7, "mr": 0.6, "map50": 0.65, "map50_95": 0.35,
        "target_histogram": np.array([0, 3, 0, 2, 0]),
    }
    contents = COCOmAPEvaluator.print_result(result)
    rows = {row[0]: [float(v) for v in row[1:]] for row in contents}
    assert rows["c1"][1] == pytest.approx(0.8)   # P of class 1
    assert rows["c3"][4] == pytest.approx(0.4)   # mAP50 of class 3
    assert rows["c0"][1:] == [0, 0, 0, 0, 0]     # absent class: all zeros
    assert rows["c2"][1:] == [0, 0, 0, 0, 0]


def test_evaluate_per_class_rejects_unknown_category():
    """Unknown category_ids must raise (reference fix_label[...] KeyError),
    not silently fold into class 0."""
    ev = COCOmAPEvaluator(_mini_gt())
    bad = [{"image_id": 1, "category_id": 99, "bbox": [10, 10, 20, 20], "score": 0.9}]
    with pytest.raises(KeyError, match="category_id 99"):
        ev.evaluate_per_class(bad)

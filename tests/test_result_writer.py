"""ResultWriter + COCO-json evaluation path tests (test_json_evaluator analogue).

The golden check: feeding the GT boxes back as perfect predictions through
the full writer -> evaluator pipeline must give mAP ~= 1.0.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from ayolov2_tpu.data import DetectionDataset
from ayolov2_tpu.utils.metrics import COCOmAPEvaluator
from ayolov2_tpu.utils.result_writer import (
    ResultWriter,
    image_id_from_path,
    yolo_labels_to_coco_json,
)

COCO_VAL = "/root/reference/tests/res/datasets/coco/images/val2017"
needs_fixtures = pytest.mark.skipif(not Path(COCO_VAL).exists(), reason="fixtures unavailable")


def test_image_id_from_path():
    assert image_id_from_path("/a/b/000000139.jpg") == 139
    assert image_id_from_path("/a/b/notanumber.jpg") > 0


@needs_fixtures
def test_gt_json_from_yolo_labels():
    ds = DetectionDataset(COCO_VAL, img_size=320, batch_size=4, stride=32,
                          label_type="segments", n_skip=8)
    gt = yolo_labels_to_coco_json(ds)
    assert len(gt["images"]) == len(ds)
    assert len(gt["annotations"]) > 0
    a = gt["annotations"][0]
    assert a["bbox"][2] > 0 and a["bbox"][3] > 0


@needs_fixtures
def test_writer_plus_evaluator_perfect_predictions(tmp_path):
    ds = DetectionDataset(COCO_VAL, img_size=320, batch_size=4, stride=32,
                          label_type="segments", n_skip=8)
    gt = yolo_labels_to_coco_json(ds)

    # fabricate perfect predictions in *letterbox* space via the item pipeline
    writer = ResultWriter(tmp_path / "preds.json")
    writer.start()
    for i in range(len(ds)):
        img, labels, path, shapes = ds[i]
        h, w = img.shape[:2]
        n = len(labels)
        det = np.zeros((max(n, 1), 6), np.float32)
        if n:
            xywh = labels[:, 1:] * np.array([w, h, w, h], np.float32)
            det[:n, 0:2] = xywh[:, :2] - xywh[:, 2:] / 2
            det[:n, 2:4] = xywh[:, :2] + xywh[:, 2:] / 2
            det[:n, 4] = 0.9
            det[:n, 5] = labels[:, 0]
        writer.add_outputs([path], det[None], np.array([n]), (h, w), [shapes])
    results = writer.close()
    assert (tmp_path / "preds.json").exists()
    assert len(results) == len(gt["annotations"])

    metrics = COCOmAPEvaluator(gt, cat_from_yolo=False).evaluate(results)
    assert metrics["map50"] > 0.95, metrics
    assert metrics["map50_95"] > 0.90, metrics


@needs_fixtures
def test_evaluator_rejects_garbage(tmp_path):
    ds = DetectionDataset(COCO_VAL, img_size=320, batch_size=4, stride=32,
                          label_type="segments", n_skip=8)
    gt = yolo_labels_to_coco_json(ds)
    rng = np.random.default_rng(0)
    garbage = [
        {
            "image_id": im["id"],
            "category_id": int(rng.choice([c["id"] for c in gt["categories"]])),
            "bbox": [float(rng.uniform(0, 100)), float(rng.uniform(0, 100)), 10.0, 10.0],
            "score": 0.5,
        }
        for im in gt["images"] for _ in range(3)
    ]
    metrics = COCOmAPEvaluator(gt, cat_from_yolo=False).evaluate(garbage)
    assert metrics["map50"] < 0.2

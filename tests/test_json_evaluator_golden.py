"""Exact-float JSON-evaluator golden — the reference's answersheet gate.

Re-creates /root/reference/tests/test_json_evaluator.py:21-33: the reference
checks a committed prediction JSON ("answersheet") against GT and asserts
the COCOmAPEvaluator's mAP to full float precision, pinning the entire
evaluator (IoU matching, crowd/area handling, 101-pt interpolation,
per-class pooling) bit-for-bit. The reference's own answersheet/GT blobs
are stripped from this mount, so ours is generated the same way theirs was
— through the real val2 CLI:

    python cli/val2.py \
        --weights runs/golden_r3_mem/train/2026_0817_runs2/weights/best.ckpt \
        --data-cfg res/configs/data/voc_fixture_memorize.yaml \
        -iw 320 -ih 320 --batch-size 8 --no-rect \
        --json-path tests/res/answersheet_voc_fixture.json

(the memorization-golden checkpoint, mAP50 0.55 train-set by the validator,
scores 0.992 COCO-protocol mAP50 on the images it memorized). GT is built
from the fixture's YOLO labels via yolo_labels_to_coco_json — itself pinned
by the GT-as-predictions ~1.0 golden in test_metrics.py.

Generating this answersheet caught a real bug: ImageFolderDataset returned
the letterbox-step ratio instead of the composed native->letterbox content
scale, so val2 predictions were pad-corrected but never de-scaled
(mAP 0.005 instead of 0.992 on non-square images).
"""

from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
VOC = "/root/reference/tests/res/datasets/VOC/images/train"
ANSWERSHEET = ROOT / "tests" / "res" / "answersheet_voc_fixture.json"

pytestmark = pytest.mark.skipif(
    not Path(VOC).exists(), reason="reference fixture dataset not mounted"
)


def test_json_evaluator_exact_floats():
    from ayolov2_tpu.data import DetectionDataset
    from ayolov2_tpu.utils.metrics import COCOmAPEvaluator
    from ayolov2_tpu.utils.result_writer import yolo_labels_to_coco_json

    ds = DetectionDataset(VOC, img_size=320, batch_size=8, stride=32)
    gt = yolo_labels_to_coco_json(ds)
    evaluator = COCOmAPEvaluator(gt, cat_from_yolo=False)
    result = evaluator.evaluate(ANSWERSHEET, max_det=100)

    # exact-float pins, reference test_json_evaluator.py:29-33 style
    assert result["map50"] == 0.9924723976340118
    assert result["map50_95"] == 0.8200376997424333
    assert result["map75"] == 0.9378594913321706
    assert result["map_small"] == 0.6705445544554456
    assert result["map_medium"] == 0.7510573262756298
    assert result["map_large"] == 0.8706585371465059

"""Accuracy golden: from-scratch fixture-VOC training must reach the mAP floor.

The learning-quality regression gate (VERDICT r1 item 3a): trains yolov5s
from scratch with res/configs/cfg/train_golden.yaml (250 epochs @320 on the
96-image reference fixture VOC set) through the REAL train CLI, then asserts
the best held-out mAP50 against a hard floor set at ~90% of the best
recorded run (see STATUS.md "Accuracy golden" for the recorded values).

Long (30 min to a few hours depending on the host's CPU for the mosaic
loader; the TPU step itself is ~1 s/epoch) — gated behind
AYOLO_GOLDEN_TEST=1. Run it whenever the trainer/loss/augmentation stack
changes materially:

    AYOLO_GOLDEN_TEST=1 python -m pytest tests/test_training_golden.py -q -s

Reference behavior certified: the full train.py->YoloTrainer->validation
loop learns (reference trains to 38.2 COCO mAP; the fixture regime is tiny,
so the floor pins the *trajectory*, not absolute quality).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
VOC = "/root/reference/tests/res/datasets/VOC/images/train"

# hard floor = 90% of the best recorded golden run (see STATUS.md
# "Accuracy golden" for the recorded values); a regression below this
# fails the gate
GOLDEN_MAP50_FLOOR = 0.0135  # 90% of the best recorded run: 0.0150 (round 2, 320px/250ep on TPU)

pytestmark = pytest.mark.skipif(
    os.environ.get("AYOLO_GOLDEN_TEST") != "1" or not Path(VOC).exists(),
    reason="long accuracy-golden run; set AYOLO_GOLDEN_TEST=1",
)


def test_fixture_voc_golden(tmp_path):
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", str(ROOT))
    proc = subprocess.run(
        [sys.executable, str(ROOT / "cli" / "train.py"),
         "--model", "res/configs/model/yolov5s.yaml",
         "--data", "res/configs/data/voc_fixture.yaml",
         "--cfg", "res/configs/cfg/train_golden.yaml",
         "--log-dir", str(tmp_path)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=4 * 3600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    ckpts = list(tmp_path.glob("train/*/weights/best.ckpt"))
    assert ckpts, f"no best.ckpt under {tmp_path}: {proc.stdout[-2000:]}"
    from ayolov2_tpu.utils.checkpoint import load_checkpoint

    meta = load_checkpoint(ckpts[0])["meta"]
    best = float(meta["best_score"])
    print(f"golden run best mAP50 = {best:.4f} (floor {GOLDEN_MAP50_FLOOR})")
    assert best >= GOLDEN_MAP50_FLOOR, (
        f"learning quality regressed: best mAP50 {best:.4f} < floor {GOLDEN_MAP50_FLOOR}"
    )

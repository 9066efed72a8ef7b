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

# Hard floor tied to the measured held-out ceiling of the fixture regime
# (runs/diag_r5/heldout_sweep.json — 300ep @320px at three aug strengths:
# best rect mAP50 off 0.0192 / light 0.0077 / full 0.0126; the r2 golden
# run recorded 0.0150 for the same full recipe). The 99-image regime caps
# near 0.02 under ANY augmentation, and the full-recipe best varies
# 0.0126-0.0150 across runs — so the floor is 80% of the cross-run MIN
# (0.0126), above the ~0.004-0.008 final-epoch noise band but tolerant of
# the measured run-to-run spread. (The previous floor, 0.0135 = 90% of the
# single r2 run, sat ABOVE the r5 full-cell measurement — a gate that
# red-flags healthy variance.)
GOLDEN_MAP50_FLOOR = 0.010

pytestmark = pytest.mark.skipif(
    os.environ.get("AYOLO_GOLDEN_TEST") != "1" or not Path(VOC).exists(),
    reason="long accuracy-golden run; set AYOLO_GOLDEN_TEST=1",
)


# Memorization gate (VERDICT r2 task 3a): train on the 99 fixture images
# with augmentation OFF and evaluate ON THE TRAINING IMAGES — a correct
# YOLOv5 stack memorizes a 99-image set. Floor calibrated from the COMPLETED
# 1500-epoch run (runs/golden_r4_mem): in-training (rect-val) mAP50 0.500 at
# epoch 300, plateau 0.663 at ep1500 under the rect-val protocol — and
# 0.995 when the final ckpt is validated on the SAME square-letterbox inputs
# it trained on (see test_memorization_capacity_square_val below; the
# rect-val plateau measures letterbox-shift robustness of an aug-free
# overfit model, not capacity). 0.40 = 80% of the recorded ep300 value.
MEMORIZE_MAP50_FLOOR = 0.40
MEMORIZE_GATE_EPOCHS = 300


def _run_train(tmp_path, data_yaml, cfg_yaml):
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", str(ROOT))
    proc = subprocess.run(
        [sys.executable, str(ROOT / "cli" / "train.py"),
         "--model", "res/configs/model/yolov5s.yaml",
         "--data", data_yaml,
         "--cfg", cfg_yaml,
         "--log-dir", str(tmp_path)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=4 * 3600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ckpts = list(tmp_path.glob("train/*/weights/best.ckpt"))
    assert ckpts, f"no best.ckpt under {tmp_path}: {proc.stdout[-2000:]}"
    from ayolov2_tpu.utils.checkpoint import load_checkpoint

    return float(load_checkpoint(ckpts[0])["meta"]["best_score"])


def test_fixture_voc_golden(tmp_path):
    best = _run_train(
        tmp_path, "res/configs/data/voc_fixture.yaml",
        "res/configs/cfg/train_golden.yaml",
    )
    print(f"golden run best mAP50 = {best:.4f} (floor {GOLDEN_MAP50_FLOOR})")
    assert best >= GOLDEN_MAP50_FLOOR, (
        f"learning quality regressed: best mAP50 {best:.4f} < floor {GOLDEN_MAP50_FLOOR}"
    )


def test_fixture_voc_memorization(tmp_path):
    """Train-set memorization gate — the strongest in-environment learning
    signal (no COCO/pretrained weights in the image). Derives a
    MEMORIZE_GATE_EPOCHS-epoch config from train_golden_memorize.yaml
    (recorded full run: 1500 epochs, runs/golden_r3_mem)."""
    import yaml

    cfg = yaml.safe_load(
        (ROOT / "res/configs/cfg/train_golden_memorize.yaml").read_text()
    )
    cfg["train"]["epochs"] = MEMORIZE_GATE_EPOCHS
    cfg["train"]["validate_period"] = 50
    gate_cfg = tmp_path / "memorize_gate.yaml"
    gate_cfg.write_text(yaml.safe_dump(cfg))

    best = _run_train(
        tmp_path, "res/configs/data/voc_fixture_memorize.yaml", str(gate_cfg)
    )
    print(f"memorization best mAP50 = {best:.4f} (floor {MEMORIZE_MAP50_FLOOR})")
    assert best >= MEMORIZE_MAP50_FLOOR, (
        f"memorization capacity regressed: best train-set mAP50 {best:.4f} "
        f"< floor {MEMORIZE_MAP50_FLOOR}"
    )

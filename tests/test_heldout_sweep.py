"""Held-out sweep CLI: the resumable-cell collection path.

cli/heldout_sweep.py re-collects a cell whose latest run already finished the
full epoch budget instead of retraining it (the sweep burns ~1 h of chip per
cell — an interruption must not restart completed cells). This test
synthesizes a completed cell (last.ckpt meta at the final epoch + best.ckpt +
metrics.json) and asserts the CLI collects it without launching a training
subprocess. Reference analogue: none (the reference's train.py has no sweep
driver); the protocol note in the artifact cites val.py:303-326.
"""

import json
import os
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def _fake_state():
    leaf = np.zeros((2,), np.float32)
    return SimpleNamespace(
        params={"w": leaf}, batch_stats={"m": leaf},
        ema_params={"w": leaf}, ema_batch_stats={"m": leaf},
        opt_state=(), ema_updates=np.int32(0), step=np.int32(0),
    )


def test_completed_cell_is_collected_not_retrained(tmp_path):
    from ayolov2_tpu.utils.checkpoint import save_checkpoint

    epochs = 3
    run = tmp_path / "off" / "train" / "2026_fake_runs"
    weights = run / "weights"
    save_checkpoint(weights / "last.ckpt", _fake_state(), epoch=epochs - 1,
                    best_score=0.5)
    save_checkpoint(weights / "best.ckpt", _fake_state(), epoch=epochs - 1,
                    best_score=0.5)
    (run / "metrics.json").write_text(json.dumps(
        {"mAP50": 0.4, "mAP50_aux": 0.6, "mAP50_95": 0.2}))

    out = tmp_path / "sweep.json"
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", str(ROOT))
    proc = subprocess.run(
        [sys.executable, str(ROOT / "cli" / "heldout_sweep.py"),
         "--cells", "off", "--epochs", str(epochs),
         "--log-root", str(tmp_path), "--out", str(out)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "completed run found, collecting" in proc.stdout

    cell = json.loads(out.read_text())["cells"]["off"]
    assert cell["collected_from_prior_run"] is True
    assert cell["wall_s"] == 0.0  # no training subprocess ran
    assert cell["best_heldout_map50_rect"] == 0.5
    assert cell["final_metrics"]["mAP50"] == 0.4
    # the synthesized run dir survived (collection must not delete it)
    assert (weights / "last.ckpt").exists()

"""Held-out ceiling sweep (VERDICT r4 task 6): what CAN the fixture support?

Capacity (train-set memorization) is proven at mAP50 0.995; held-out quality
on the 99-image fixture has only ever been measured at the 0.003-0.015 noise
band under full-mosaic augmentation. This sweep maps the regime: a fixed
budget (default 300 epochs @320px) at three augmentation strengths —

  off    — no augmentation at all (pure letterbox; the overfit ceiling)
  light  — half-strength geometry + HSV + flip, no mosaic crops of context
  full   — the reference-strength recipe (train_golden.yaml: mosaic 1.0,
           scale 0.5, copy_paste 0.1, flip)

trains each cell through the REAL train CLI (fresh run dir per cell), vals
on the held-out fixture split under the reference rect protocol (primary)
PLUS the train-geometry protocol (val_geometry: both — the r4 lesson), and
writes one JSON artifact with best/final mAP50 per cell. The held-out gate
floor in tests/test_training_golden.py is then tied to the measured ceiling.

Usage: python cli/heldout_sweep.py [--epochs 300] [--cells off light full]
       [--out runs/diag_r5/heldout_sweep.json] [--device-aug]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

BASE_CFG = ROOT / "res/configs/cfg/train_golden.yaml"
DATA = "res/configs/data/voc_fixture.yaml"

CELLS = {
    # cell -> yolo_augmentation overrides (+ policies on/off)
    "off": {"augment": False, "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0,
            "_policies": False},
    "light": {"augment": True, "mosaic": 0.5, "mixup": 0.0, "copy_paste": 0.0,
              "scale": 0.2, "translate": 0.05, "hsv_h": 0.0075, "hsv_s": 0.35,
              "hsv_v": 0.2, "_policies": True},
    "full": {"_policies": True},  # train_golden.yaml as-is (reference recipe)
}


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--cells", nargs="+", default=["off", "light", "full"],
                   choices=list(CELLS))
    p.add_argument("--out", default="runs/diag_r5/heldout_sweep.json")
    p.add_argument("--log-root", default="runs/diag_r5/sweep")
    p.add_argument("--validate-period", type=int, default=25)
    p.add_argument("--device-aug", action="store_true",
                   help="use on-device augmentation where eligible "
                        "(cells without copy_paste)")
    args = p.parse_args()

    base = yaml.safe_load(BASE_CFG.read_text())
    results = {}
    for cell in args.cells:
        cfg = copy.deepcopy(base)
        cfg["train"].update(
            epochs=args.epochs, validate_period=args.validate_period,
            # log BOTH protocols: primary rect (reference held-out contract)
            # + train-geometry aux (the r4 val-protocol lesson)
            val_geometry="both",
        )
        over = dict(CELLS[cell])
        policies = over.pop("_policies")
        cfg["yolo_augmentation"].update(over)
        if not policies:
            cfg["augmentation"] = []
        if args.device_aug and not cfg["yolo_augmentation"].get("copy_paste", 0.0):
            cfg["train"]["device_aug"] = True

        log_dir = Path(args.log_root) / cell
        log_dir.mkdir(parents=True, exist_ok=True)
        cfg_path = log_dir / "cell_cfg.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        from ayolov2_tpu.utils.checkpoint import load_checkpoint

        # Resumability: a cell whose latest run already finished the full
        # budget (last.ckpt meta epoch == epochs-1) is collected, not
        # retrained — the sweep can be relaunched after an interruption
        # without burning chip time on completed cells.
        collected = False
        dt = 0.0
        done = sorted(log_dir.glob("train/*/weights/last.ckpt"))
        if done:
            try:
                last_meta = load_checkpoint(done[-1])["meta"]
                collected = int(last_meta.get("epoch", -1)) >= args.epochs - 1
            except Exception:
                collected = False
        if collected:
            print(f"cell {cell}: completed run found, collecting", flush=True)
        else:
            # drop any partial (interrupted) run so the rerun is a clean cell
            for stale in sorted(log_dir.glob("train/*")):
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
            t0 = time.perf_counter()
            env = dict(os.environ)
            env.setdefault("PYTHONPATH", str(ROOT))
            proc = subprocess.run(
                [sys.executable, str(ROOT / "cli" / "train.py"),
                 "--model", "res/configs/model/yolov5s.yaml",
                 "--data", DATA, "--cfg", str(cfg_path),
                 "--log-dir", str(log_dir)],
                cwd=ROOT, env=env, capture_output=True, text=True,
                timeout=3 * 3600,
            )
            dt = time.perf_counter() - t0
            if proc.returncode != 0:
                print(f"cell {cell} FAILED rc={proc.returncode}", file=sys.stderr)
                print(proc.stderr[-3000:], file=sys.stderr)
                results[cell] = {"error": proc.returncode}
                continue

        ckpts = sorted(log_dir.glob("train/*/weights/best.ckpt"))
        meta = load_checkpoint(ckpts[-1])["meta"] if ckpts else {}
        metrics_files = sorted(log_dir.glob("train/*/metrics.json"))
        final = {}
        if metrics_files:
            try:
                final = json.loads(metrics_files[-1].read_text())
            except Exception:
                pass
        results[cell] = {
            "best_heldout_map50_rect": float(meta.get("best_score", 0.0)),
            "final_metrics": {k: v for k, v in final.items()
                              if not isinstance(v, dict)},
            "wall_s": round(dt, 1),
            "collected_from_prior_run": collected,
            "epochs": args.epochs,
            "device_aug": bool(cfg["train"].get("device_aug", False)),
        }
        print(json.dumps({cell: results[cell]}), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "note": (
            "Held-out ceiling sweep (VERDICT r4 task 6): 99-image fixture "
            f"VOC, {args.epochs} epochs @320px per cell, val on the held-out "
            "fixture split, primary = reference rect pad-0.5 protocol "
            "(val.py:303-326), aux = train-geometry protocol logged as "
            "mAP50_aux. best_heldout_map50_rect is the ckpt-meta best score."
        ),
        "cells": results,
    }, indent=1))
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

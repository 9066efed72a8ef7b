"""Create an SWA (Stochastic Weight Averaging) model from epoch checkpoints.

Parity target: /root/reference/create_swa_model.py:40-83 — rank
``epoch_*.ckpt`` files in the model dir by their stored mAP50, equally
average the state of the best N, save the result.

TPU deltas: state dicts are param pytrees; the average covers params AND
batch_stats (the reference averages full state_dicts which include BN
running stats), and the result is written under both model and ema branches.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import jax
import numpy as np

from ayolov2_tpu.utils.checkpoint import load_checkpoint
from ayolov2_tpu.utils.logger import get_logger
from flax import serialization

LOGGER = get_logger("swa")


def average_trees(trees):
    """Equal-weight average of a list of pytrees (fp32 accumulate)."""
    def avg(*leaves):
        acc = np.zeros_like(np.asarray(leaves[0], dtype=np.float32))
        for leaf in leaves:
            acc += np.asarray(leaf, dtype=np.float32)
        return acc / len(leaves)

    return jax.tree_util.tree_map(avg, *trees)


def create_swa_model(model_dir: str, swa_model_name: str, best_num: int) -> str:
    """Average the best ``best_num`` epoch checkpoints by stored mAP50."""
    model_dir_p = Path(model_dir)
    candidates = []
    for f in sorted(model_dir_p.glob("epoch_*.ckpt")):
        if not re.match(r"epoch_\d+\.ckpt", f.name):
            continue
        raw = load_checkpoint(f)
        map50 = float(raw.get("meta", {}).get("map50", -1.0))
        candidates.append((map50, f, raw))
    assert candidates, f"no epoch_*.ckpt files found in {model_dir}"

    candidates.sort(key=lambda c: -c[0])
    chosen = candidates[:best_num]
    LOGGER.info(
        "SWA over %d ckpts: %s", len(chosen), [(c[1].name, round(c[0], 4)) for c in chosen]
    )

    # average the EMA branch (falls back to model when absent), incl. BN stats
    branches = [c[2].get("ema") or c[2]["model"] for c in chosen]
    avg_params = average_trees([b["params"] for b in branches])
    avg_stats = average_trees([b["batch_stats"] for b in branches])

    meta = dict(chosen[0][2]["meta"])
    meta["map50"] = float(np.mean([c[0] for c in chosen]))
    out = {
        "meta": meta,
        "model": {"params": avg_params, "batch_stats": avg_stats},
        "ema": {"params": avg_params, "batch_stats": avg_stats},
    }
    out_path = model_dir_p / swa_model_name
    out_path.write_bytes(serialization.msgpack_serialize(out))
    LOGGER.info("SWA model written to %s", out_path)
    return str(out_path)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Create SWA model from epoch checkpoints.")
    parser.add_argument("--model_dir", "-d", type=str, required=True,
                        help="directory containing epoch_*.ckpt files")
    parser.add_argument("--swa_model_name", "-n", type=str, default="swa.ckpt")
    parser.add_argument("--best_num", "-b", type=int, default=5,
                        help="average over the best N checkpoints by mAP50")
    return parser


if __name__ == "__main__":
    args = get_parser().parse_args()
    create_swa_model(args.model_dir, args.swa_model_name, args.best_num)

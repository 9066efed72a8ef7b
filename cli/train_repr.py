"""Train a representation-learning model (SimpleRL or SimCLR).

Parity target: /root/reference/train_repr.py:61-132 — RL/SimCLR dataset +
augmentation policy selection, repr trainer. TPU deltas: one process drives
the mesh (no DataParallel wrapper).

Usage:
    python cli/train_repr.py --model res/configs/model/simclr.yaml \
        --data res/configs/data/coco.yaml --cfg res/configs/cfg/train_config_repr.yaml
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

import jax
import jax.numpy as jnp

from ayolov2_tpu.data.datasets_repr import RLDataLoader, RLImageDataset, SimCLRDataset
from ayolov2_tpu.models import build_model, init_model
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.train.repr_trainer import RepresentationLearningTrainer
from ayolov2_tpu.utils.config import load_yaml, make_run_dir
from ayolov2_tpu.utils.general import check_img_size
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("train_repr")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Representation learning (train_repr.py parity).")
    parser.add_argument("--model", type=str, default="res/configs/model/simclr.yaml")
    parser.add_argument("--data", type=str, default="res/configs/data/coco.yaml")
    parser.add_argument("--cfg", type=str, default="res/configs/cfg/train_config_repr.yaml")
    parser.add_argument("--log-dir", type=str, default="runs")
    parser.add_argument("--rl-type", type=str, default="",
                        choices=["", "base", "simclr"],
                        help="representation-learning type (overrides the cfg)")
    return parser


def main() -> None:
    args = get_parser().parse_args()
    cfg = load_yaml(args.cfg)
    data_cfg = load_yaml(args.data)
    tcfg = cfg["train"]
    rl_type = args.rl_type or tcfg.get("rl_type", "base")

    model_cfg = parse_model_config(args.model)
    model = build_model(model_cfg, dtype=jnp.float32)
    img_size = check_img_size(int(tcfg["image_size"]), 32)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=img_size)

    ds_cls = SimCLRDataset if rl_type == "simclr" else RLImageDataset
    common = dict(
        img_size=img_size,
        batch_size=int(tcfg["batch_size"]),
        n_skip=int(tcfg.get("n_skip", 0)),
        n_trans=int(tcfg.get("n_trans", 2)),
        augmentation=cfg.get("augmentation"),
    )
    train_ds = ds_cls(data_cfg["train_path"], **common)
    train_loader = RLDataLoader(train_ds, batch_size=int(tcfg["batch_size"]), shuffle=True)
    val_loader = None
    if data_cfg.get("val_path"):
        val_ds = ds_cls(data_cfg["val_path"], **common)
        val_loader = RLDataLoader(val_ds, batch_size=int(tcfg["batch_size"]))

    log_dir = make_run_dir(args.log_dir, "train_repr")
    trainer = RepresentationLearningTrainer(
        model, variables, cfg, train_loader, val_loader,
        rl_type=rl_type, log_dir=str(log_dir), model_cfg_dict=model_cfg,
    )
    trainer.train()


if __name__ == "__main__":
    main()

"""Decompose a model's convolutions (Tucker-2 + EVBMF), validate before/after.

Parity target: /root/reference/decompose_model.py:107-299 — validate the
original, decompose on CPU-side numerics, re-validate the decomposed model,
write an args.yaml with both results plus the decomposed checkpoint.

TPU deltas: decomposition transforms the param pytree and emits a
decompose_map baked into the checkpoint meta; the decomposed model is a
1x1 -> kxk -> 1x1 ConvBnAct trace (models/layers.py).

Usage:
    python cli/decompose_model.py --weights best.ckpt \
        --data-cfg res/configs/data/coco.yaml --loss-thr 0.1 --prune-step 0.1
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ayolov2_tpu.compress import decompose_model
from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.eval import YoloValidator
from ayolov2_tpu.models import build_model, count_params
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.utils.checkpoint import load_variables
from ayolov2_tpu.utils.config import load_yaml
from ayolov2_tpu.utils.general import check_img_size
from ayolov2_tpu.utils.logger import get_logger
from flax import serialization

LOGGER = get_logger("decompose")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Tucker/EVBMF model decomposition.")
    parser.add_argument("--weights", type=str, default="", help="checkpoint (.ckpt)")
    parser.add_argument("--model-cfg", type=str, default="")
    parser.add_argument("--data-cfg", type=str, default="res/configs/data/coco.yaml")
    parser.add_argument("--loss-thr", type=float, default=0.1,
                        help="per-layer forward-diff threshold")
    parser.add_argument("--prune-step", type=float, default=0.01,
                        help="binary-search granularity for prune ratio (0 = no prune)")
    parser.add_argument("-iw", "--img-width", type=int, default=640)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip-validation", action="store_true")
    parser.add_argument("--out", type=str, default="", help="output ckpt path")
    parser.add_argument("-ih", "--img-height", type=int, default=-1)
    parser.add_argument("-ct", "--conf-t", type=float, default=0.001)
    parser.add_argument("-it", "--iou-t", type=float, default=0.65)
    parser.add_argument("--device", type=str, default="",
                        help="reference-CLI parity (GPU id); logged only on TPU")
    parser.add_argument("--dst", type=str, default="",
                        help="export dir: {dst}/decompose/{DATE}_runs (else next to ckpt)")
    parser.add_argument("--rect", action="store_true", dest="rect", default=True)
    parser.add_argument("--no-rect", action="store_false", dest="rect")
    parser.add_argument("--single-cls", action="store_true")
    parser.add_argument("--plot", action="store_true",
                        help="save before/after validation plots under dst")
    return parser


def run_validation(model_cfg, variables, data_cfg, img_size, batch_size,
                   decompose_map=(), args=None):
    model = build_model(model_cfg, dtype=jnp.bfloat16, nc=int(data_cfg["nc"]),
                        decompose_map=decompose_map)
    stride = int(max(model.stride))
    rect = getattr(args, "rect", True)
    single_cls = getattr(args, "single_cls", False)
    dataset = DetectionDataset(
        data_cfg["val_path"], img_size=img_size, batch_size=batch_size, rect=rect,
        pad=0.5, stride=stride, single_cls=single_cls,
        label_type="segments" if str(data_cfg.get("dataset", "")).lower() == "coco" else "labels",
    )
    loader = DataLoader(dataset, batch_size=batch_size)
    cfg = {"single_cls": single_cls}
    if args is not None:
        cfg.update(conf_t=args.conf_t, iou_t=args.iou_t)
        if getattr(args, "plot", False) and getattr(args, "_plot_dir", None):
            cfg["plot_dir"] = args._plot_dir
    v = YoloValidator(model, variables, loader, cfg=cfg)
    return v.validation()


def main() -> None:
    args = get_parser().parse_args()
    if args.device:
        LOGGER.info("--device=%s accepted for reference-CLI parity", args.device)
    if args.img_height < 0:
        args.img_height = args.img_width
    data_cfg = load_yaml(args.data_cfg)
    img_size = check_img_size(max(args.img_width, args.img_height), 32)
    args._plot_dir = None
    if args.dst:
        from ayolov2_tpu.utils.config import make_run_dir

        args._plot_dir = str(make_run_dir(args.dst, "decompose"))

    variables, meta = load_variables(args.weights, prefer_ema=True, model_cfg=args.model_cfg,
                                     nc=int(data_cfg["nc"]))
    model_cfg = args.model_cfg or (json.loads(meta["model_cfg"]) if meta.get("model_cfg") else None)
    assert model_cfg, "need --model-cfg or a checkpoint with embedded model config"
    if isinstance(model_cfg, str):
        model_cfg = parse_model_config(model_cfg)

    n_before = count_params(variables["params"])
    result_before = None
    if not args.skip_validation:
        result_before = run_validation(model_cfg, variables, data_cfg, img_size, args.batch_size, args=args)

    decompose_map, new_params, report = decompose_model(
        variables["params"],
        loss_thr=args.loss_thr,
        prune_step=args.prune_step,
        seed=args.seed,
    )
    new_vars = {"params": new_params, "batch_stats": variables.get("batch_stats", {})}
    n_after = count_params(new_params)
    LOGGER.info("params: %s -> %s (%.1f%%), %d convs decomposed",
                f"{n_before:,}", f"{n_after:,}", 100 * n_after / n_before, len(decompose_map))

    result_after = None
    if not args.skip_validation:
        result_after = run_validation(
            model_cfg, new_vars, data_cfg, img_size, args.batch_size, decompose_map, args=args
        )

    if args.out:
        out = args.out
    elif args._plot_dir:
        out = str(Path(args._plot_dir) / (Path(args.weights).stem + f"_decomposed_seed_{args.seed}.ckpt"))
    else:
        out = str(Path(args.weights).with_name(
            Path(args.weights).stem + f"_decomposed_seed_{args.seed}.ckpt"
        ))
    payload = {
        "meta": {
            **{k: meta.get(k, 0) for k in ("version", "epoch", "best_score", "map50", "ema_updates", "step")},
            "model_cfg": json.dumps(model_cfg),
            "decompose_map": json.dumps(decompose_map),
        },
        "model": {"params": new_params, "batch_stats": new_vars["batch_stats"]},
        "ema": {"params": new_params, "batch_stats": new_vars["batch_stats"]},
    }
    Path(out).write_bytes(serialization.msgpack_serialize(payload))

    args_yaml = Path(out).with_suffix(".args.yaml")
    args_yaml.write_text(yaml.dump({
        "params_before": int(n_before),
        "params_after": int(n_after),
        "loss_thr": args.loss_thr,
        "prune_step": args.prune_step,
        "map50_before": result_before["map50"] if result_before else None,
        "map50_after": result_after["map50"] if result_after else None,
        "report": report,
    }))
    LOGGER.info("decomposed ckpt: %s (+ %s)", out, args_yaml)


if __name__ == "__main__":
    main()

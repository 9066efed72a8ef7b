"""Soft-teacher knowledge distillation CLI.

Parity target: /root/reference/distillation.py:87-193 — wire a student
(model YAML or ckpt), a frozen teacher (ckpt), labeled/unlabeled loaders,
and the SoftTeacherTrainer. TPU delta: teacher and student share the mesh
(the reference pins them to separate GPUs).

Usage:
    python cli/distillation.py --model res/configs/model/yolov5s.yaml \
        --teacher teacher.ckpt --data res/configs/data/coco.yaml \
        --unlabeled-path /data/unlabeled --cfg res/configs/cfg/distillation.yaml
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

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.models import build_model, fuse_params, init_model
from ayolov2_tpu.parallel import initialize_distributed, is_main_process
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.train.kd_trainer import SoftTeacherTrainer
from ayolov2_tpu.utils.checkpoint import load_variables
from ayolov2_tpu.utils.config import load_yaml, make_run_dir
from ayolov2_tpu.utils.general import check_img_size
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("distillation")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Soft-teacher distillation (distillation.py parity).")
    parser.add_argument("--model", type=str, default="res/configs/model/yolov5s.yaml")
    parser.add_argument("--teacher", type=str, required=True, help="teacher checkpoint (.ckpt)")
    parser.add_argument("--data", type=str, default="res/configs/data/coco.yaml")
    parser.add_argument("--unlabeled-path", type=str, default="",
                        help="unlabeled image dir (default: train_path without labels)")
    parser.add_argument("--cfg", type=str, default="res/configs/cfg/distillation.yaml")
    parser.add_argument("--log-dir", "--log_dir", type=str, default="runs")
    parser.add_argument("--teacher-cfg", "--teacher_cfg", type=str, default="",
                        help="teacher model YAML (else from the teacher ckpt meta)")
    parser.add_argument("--resume", type=str, default="",
                        help="student checkpoint to resume/transfer from")
    parser.add_argument("--device", type=str, default="",
                        help="reference-CLI parity (student GPU id); logged only")
    parser.add_argument("--teacher-device", "--teacher_device", type=str, default="",
                        help="reference-CLI parity (teacher GPU id); logged only — "
                             "teacher and student share the jitted program here")
    parser.add_argument("--wlog", action="store_true", help="enable wandb if available")
    parser.add_argument("--wlog-name", "--wlog_name", type=str, default="", help="wandb run name")
    return parser


def main() -> None:
    args = get_parser().parse_args()
    if args.device or args.teacher_device:
        LOGGER.info("--device/--teacher-device accepted for reference-CLI parity; "
                    "teacher+student run in one jitted program on the ambient devices")
    cfg = load_yaml(args.cfg)
    data_cfg = load_yaml(args.data)
    tcfg = cfg["train"]
    nc = int(data_cfg["nc"])
    initialize_distributed()

    # teacher: fused eval graph from its checkpoint
    t_vars, t_meta = load_variables(args.teacher, prefer_ema=True,
                                    model_cfg=args.teacher_cfg or args.model, nc=nc)
    # a reference-.pt teacher without --teacher-cfg falls back to the
    # STUDENT's --model YAML as its graph template; if the architectures
    # differ the import leaves most tensors at random init — KD against a
    # partially random teacher must fail loudly, not proceed on a warning
    t_unmatched = int(t_meta.get("torch_unmatched", 0))
    t_matched = int(t_meta.get("torch_matched", 0)) or 1
    if t_unmatched > 0.25 * (t_matched + t_unmatched):
        raise SystemExit(
            f"teacher {args.teacher}: {t_unmatched} of {t_matched + t_unmatched} "
            "tensors did not match the graph template "
            f"({args.teacher_cfg or args.model}) — pass --teacher-cfg with the "
            "YAML the teacher was trained with"
        )
    if args.teacher_cfg:
        t_cfg = parse_model_config(args.teacher_cfg)
    else:
        t_cfg = json.loads(t_meta["model_cfg"]) if t_meta.get("model_cfg") else args.model
    teacher = build_model(t_cfg, dtype=jnp.bfloat16, fused=True, nc=nc)
    t_vars = fuse_params(t_vars)

    # student
    model_cfg = parse_model_config(args.model)
    student = build_model(model_cfg, dtype=jnp.float32, nc=nc)
    img_size = check_img_size(int(tcfg["image_size"]), int(max(student.stride)))
    s_vars = init_model(student, jax.random.PRNGKey(0), img_size=img_size)
    if args.resume:
        from ayolov2_tpu.utils.checkpoint import intersect_trees

        r_vars, _ = load_variables(args.resume, prefer_ema=True)
        merged, n_match, n_total = intersect_trees(r_vars["params"], s_vars["params"])
        s_vars = {"params": merged, "batch_stats": s_vars.get("batch_stats", {})}
        LOGGER.info("resumed %d/%d student tensors from %s", n_match, n_total, args.resume)

    common = dict(
        img_size=img_size, batch_size=int(tcfg["batch_size"]),
        stride=int(max(student.stride)), n_skip=int(tcfg.get("n_skip", 0)),
        label_type=tcfg.get("label_type", "labels"),
    )
    labeled = DetectionDataset(
        data_cfg["train_path"],
        yolo_augmentation=cfg.get("yolo_augmentation"),
        augmentation=cfg.get("augmentation"),
        **common,
    )
    unlabeled = DetectionDataset(args.unlabeled_path or data_cfg["train_path"], **common)
    shard = (jax.process_index(), jax.process_count())
    labeled_loader = DataLoader(labeled, batch_size=int(tcfg["batch_size"]), shuffle=True,
                                drop_last=True, shard=shard)
    unlabeled_loader = DataLoader(unlabeled, batch_size=int(tcfg["batch_size"]), shuffle=True,
                                  drop_last=True, shard=shard)

    # epoch validation -> best.ckpt by mAP50 (reference kd_trainer.py:276-309)
    val_loader = None
    if data_cfg.get("val_path") and is_main_process():
        val_ds = DetectionDataset(
            data_cfg["val_path"], img_size=img_size, batch_size=int(tcfg["batch_size"]),
            stride=int(max(student.stride)), n_skip=int(tcfg.get("n_skip", 0)),
            label_type=tcfg.get("label_type", "labels"),
        )
        val_loader = DataLoader(val_ds, batch_size=int(tcfg["batch_size"]), shuffle=False)

    log_dir = make_run_dir(args.log_dir, "distill")
    trainer = SoftTeacherTrainer(
        student, {"params": s_vars["params"], "batch_stats": s_vars.get("batch_stats", {})},
        teacher, t_vars, cfg, labeled_loader, unlabeled_loader, val_loader=val_loader,
        log_dir=str(log_dir), model_cfg_dict=model_cfg,
        class_names=data_cfg.get("names"),
    )
    trainer.train()


if __name__ == "__main__":
    main()

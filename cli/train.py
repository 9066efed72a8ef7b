"""Train a model from the YAML config triple (model / data / train cfg).

Parity target: /root/reference/train.py — argparse + 3 YAMLs, model build
(YAML or checkpoint), loaders, trainer. TPU deltas: no DDP launcher — one
process drives the whole device mesh (jax.distributed for multi-host);
"half"/AMP is bf16 end-to-end; wandb is replaced by a local metrics JSON
unless wandb is importable and --wandb is passed.

Usage:
    python cli/train.py --model res/configs/model/yolov5s.yaml \
        --data res/configs/data/coco.yaml --cfg res/configs/cfg/train_config.yaml
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

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.models import build_model, init_model
from ayolov2_tpu.parallel import initialize_distributed, is_main_process
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.train.trainer import YoloTrainer
from ayolov2_tpu.utils.checkpoint import intersect_trees, load_variables
from ayolov2_tpu.utils.config import load_yaml, make_run_dir, snapshot_configs
from ayolov2_tpu.utils.general import check_img_size
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("train")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train a model (reference train.py parity).")
    parser.add_argument("--model", type=str, default="res/configs/model/yolov5s.yaml",
                        help="model YAML or checkpoint (.ckpt)")
    parser.add_argument("--data", type=str, default="res/configs/data/coco.yaml")
    parser.add_argument("--cfg", type=str, default="res/configs/cfg/train_config.yaml")
    parser.add_argument("--wlog", action="store_true", help="enable wandb logging if available")
    parser.add_argument("--wlog-name", "--wlog_name", type=str, default="", help="wandb run name")
    parser.add_argument("--log-dir", "--log_dir", type=str, default="runs", help="log root directory")
    parser.add_argument("--use-swa", "--use_swa", action="store_true", help="save per-epoch ckpts for SWA")
    parser.add_argument("--resume", type=str, default="", help="checkpoint to resume from")
    parser.add_argument("--n-devices", type=int, default=0, help="limit device count (0 = all)")
    parser.add_argument("--local_rank", type=int, default=-1,
                        help="reference-CLI parity (torch DDP launcher rank); the mesh "
                             "runtime derives rank from jax.process_index() — logged only")
    return parser


def main() -> None:
    args = get_parser().parse_args()
    cfg = load_yaml(args.cfg)
    data_cfg = load_yaml(args.data)
    tcfg = cfg["train"]

    # multi-host bootstrap (ddp_init parity) — must run before any mesh use;
    # AYOLO_NUM_PROCS/AYOLO_PROC_ID/AYOLO_COORDINATOR drive explicit clusters
    initialize_distributed()
    shard = (jax.process_index(), jax.process_count())

    log_dir = make_run_dir(args.log_dir, "train")
    if is_main_process():
        snapshot_configs(
            log_dir,
            merged={"cfg": cfg, "data": data_cfg},
            files={"model": args.model, "data": args.data, "cfg": args.cfg},
        )
    LOGGER.info("Run dir: %s (host %d/%d)", log_dir, shard[0], shard[1])

    nc = 1 if tcfg.get("single_cls") else int(data_cfg["nc"])
    names = data_cfg.get("names") or [str(i) for i in range(nc)]

    # --- model: YAML config or checkpoint (train.py:136-145) ---
    init_weights = None
    if args.model.endswith(".pt"):
        # a torch pickle carries no kindle YAML we can rebuild from — take
        # the reference-.pt weights via the config instead (README.md:380-385
        # SWA finetune analogue): --model <yaml> + cfg train.weights: <pt>
        raise SystemExit(
            f"--model {args.model}: reference .pt weights can't define the graph "
            "here; pass --model <model yaml> and set `weights: "
            f"{args.model}` in the train config (or convert once with "
            "cli/import_torch_weights.py)"
        )
    if args.model.endswith(".ckpt"):
        init_weights, meta = load_variables(args.model, prefer_ema=True)
        model_cfg = json.loads(meta["model_cfg"]) if meta.get("model_cfg") else None
        assert model_cfg, "checkpoint lacks an embedded model config; pass a YAML"
    else:
        model_cfg = parse_model_config(args.model)
    # train.remat: per-layer activation rematerialization (jax.checkpoint) —
    # true = full remat (~1 extra forward of FLOPs buys O(layer) live
    # activation memory); "save_convs" = selective policy (conv/MXU outputs
    # saved, only elementwise/BN work recomputed). Gradient parity is
    # bit-exact for both (tests/test_models.py::test_remat_grad_parity)
    remat = tcfg.get("remat", False)
    model = build_model(model_cfg, dtype=jnp.bfloat16 if tcfg.get("half", True) else jnp.float32, nc=nc,
                        remat=remat if isinstance(remat, str) else bool(remat))

    stride = int(max(model.stride))
    img_size = check_img_size(int(tcfg["image_size"]), stride)

    # --- datasets / loaders ---
    label_type = tcfg.get("label_type", "labels")
    common = dict(
        img_size=img_size,
        batch_size=int(tcfg["batch_size"]),
        stride=stride,
        n_skip=int(tcfg.get("n_skip", 0)),
        label_type=label_type,
        single_cls=bool(tcfg.get("single_cls", False)),
        cache_images=tcfg.get("cache_image"),
    )
    train_dataset = DetectionDataset(
        data_cfg["train_path"],
        rect=bool(tcfg.get("rect", False)),
        yolo_augmentation=cfg.get("yolo_augmentation"),
        augmentation=cfg.get("augmentation"),
        **common,
    )
    if bool(tcfg.get("device_aug", False)):
        # on-device augmentation (ayolov2_tpu/data/device_augment.py): the
        # loader workers plan geometry/labels only; mosaic+warp+HSV+flip
        # pixels run as one jitted program on the chip. 'auto' keeps the
        # source frames device-resident when the dataset fits (<=2 GB).
        resident = tcfg.get("device_aug_resident", "auto")
        if resident == "auto":
            n_bytes = len(train_dataset) * img_size * img_size * 3
            resident = n_bytes <= 2 * 1024**3
        train_dataset.enable_device_aug(resident=bool(resident))
        LOGGER.info(
            "device augmentation ON (%s source frames)",
            "resident" if resident else "streamed",
        )
    train_loader = DataLoader(
        train_dataset,
        batch_size=int(tcfg["batch_size"]),
        shuffle=not tcfg.get("rect", False),
        drop_last=True,
        workers=int(tcfg.get("workers", 4)),
        workers_mode=str(tcfg.get("workers_mode", "thread")),
        max_labels_per_image=int(tcfg.get("max_labels_per_image", 64)),
        # per-host input sharding (DistributedSampler analogue,
        # data_loader_utils.py:67,101-103): each host loads 1/N of every batch
        shard=shard,
    )
    # In-training validation protocol (train.val_geometry):
    #   rect  (default) — the reference's held-out protocol: rect batches,
    #           pad 0.5 (val.py:303-326, train_utils.py:573-609).
    #   train — validation geometry MATCHES training geometry (square
    #           letterbox when rect/aug are off). An aug-free overfit run
    #           validated rect-pad-0.5 reads ~0.33 mAP50 low (the r4
    #           memorization run scored 0.663 rect vs 0.995 on its actual
    #           training frames) — use this for memorization/aug-off runs.
    #   both  — primary rect (best-ckpt/early-stop source) + a second
    #           train-geometry pass logged as mAP50_train_geom each val.
    val_geometry = str(tcfg.get("val_geometry", "rect"))
    val_loader = val_loader_aux = None
    if data_cfg.get("val_path") and is_main_process():

        def _val_loader(rect: bool, pad: float):
            ds = DetectionDataset(data_cfg["val_path"], rect=rect, pad=pad, **common)
            return DataLoader(
                ds,
                batch_size=int(tcfg["batch_size"]),
                max_labels_per_image=int(tcfg.get("max_labels_per_image", 64)),
            )

        train_geom = dict(rect=bool(tcfg.get("rect", False)), pad=0.0)
        if val_geometry == "train":
            val_loader = _val_loader(**train_geom)
        else:
            val_loader = _val_loader(rect=True, pad=0.5)
            if val_geometry == "both":
                val_loader_aux = _val_loader(**train_geom)

    # --- init / transfer weights ---
    variables = init_model(model, jax.random.PRNGKey(0), img_size=img_size)
    variables = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    if init_weights is not None:
        merged, n_match, n_total = intersect_trees(init_weights["params"], variables["params"])
        variables["params"] = merged
        if init_weights.get("batch_stats"):
            bs_merged, _, _ = intersect_trees(init_weights["batch_stats"], variables["batch_stats"])
            variables["batch_stats"] = bs_merged
        LOGGER.info("Transferred %d/%d param tensors from %s", n_match, n_total, args.model)
    elif tcfg.get("weights"):
        # reference .pt accepted here too (SWA finetune: --model <yaml> with
        # cfg train.weights: yolov5l_kindle.pt, README.md:380-385)
        w, w_meta = load_variables(tcfg["weights"], prefer_ema=True, model_cfg=model_cfg, nc=nc)
        merged, n_match, n_total = intersect_trees(w["params"], variables["params"])
        variables["params"] = merged
        # for a .pt the intersect above matches the importer's *template*
        # (always full) — report and gate on the TORCH-side match counts so
        # a wrong weights/model-cfg pairing can't masquerade as a transfer
        t_matched = w_meta.get("torch_matched")
        t_unmatched = w_meta.get("torch_unmatched", 0)
        if t_matched is not None:
            LOGGER.info("Torch import %s: %d tensors matched, %d unmatched",
                        tcfg["weights"], t_matched, t_unmatched)
            if t_unmatched > t_matched:
                raise SystemExit(
                    f"weights {tcfg['weights']}: {t_unmatched} of "
                    f"{t_matched + t_unmatched} tensors did not match the "
                    f"--model graph — wrong weights/model-cfg pairing? "
                    "(pass the YAML the .pt was trained with)"
                )
        else:
            LOGGER.info("Transferred %d/%d param tensors from %s", n_match, n_total, tcfg["weights"])

    trainer = YoloTrainer(
        model,
        variables,
        cfg,
        train_loader,
        val_loader=val_loader,
        val_loader_aux=val_loader_aux,
        log_dir=str(log_dir),
        class_names=names,
        use_swa=args.use_swa,
        n_devices=args.n_devices or None,
        model_cfg_dict=model_cfg if isinstance(model_cfg, dict) else parse_model_config(model_cfg),
    )
    if args.resume:
        trainer.resume(args.resume)

    wandb_run = None
    if args.wlog and is_main_process():
        try:
            import wandb  # noqa: F401 — optional, not in the base image

            wandb_run = wandb.init(project="ayolov2_tpu", name=args.wlog_name or None, config=cfg)
        except ImportError:
            LOGGER.warning("wandb not installed; falling back to local metric JSON")

    trainer.train()

    if is_main_process():
        metrics_path = Path(log_dir) / "metrics.json"
        metrics_path.write_text(json.dumps({k: v for k, v in trainer.state_dict.items() if not isinstance(v, np.ndarray)}, indent=2, default=float))
        if wandb_run is not None:
            wandb_run.log(trainer.state_dict)
            wandb_run.finish()
        LOGGER.info("Metrics written to %s", metrics_path)


if __name__ == "__main__":
    main()

"""Input-pipeline vs device-step throughput benchmark.

Measures, separately:
  - loader img/s: DetectionDataset (mosaic/perspective/HSV on) through the
    multi-worker DataLoader — the host-side hot loop (SURVEY §3 hot-loop (c),
    reference torch DataLoader: scripts/data_loader/data_loader_utils.py:96-116)
  - step img/s: the jitted sharded train step on synthetic device-resident
    batches (pure device throughput, no input pipeline)

so the train-time bottleneck is measured, not guessed. Prints one JSON line:
{"loader_img_s", "step_img_s", "bottleneck"}.

Usage:
    python cli/bench_loader.py --data res/configs/data/voc_fixture.yaml \
        --cfg res/configs/cfg/train_config.yaml --batches 20 [--no-step]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Tuple

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("bench_loader")


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Loader vs train-step throughput")
    p.add_argument("--data", type=str, default="res/configs/data/voc_fixture.yaml")
    p.add_argument("--cfg", type=str, default="res/configs/cfg/train_config.yaml")
    p.add_argument("--model", type=str, default="res/configs/model/yolov5s.yaml")
    p.add_argument("--batch-size", type=int, default=0, help="0 = train cfg value")
    p.add_argument("--img-size", type=int, default=0, help="0 = train cfg value")
    p.add_argument("--workers", type=int, default=-1, help="-1 = train cfg value")
    p.add_argument("--batches", type=int, default=20, help="timed batches per phase")
    p.add_argument("--no-step", action="store_true", help="skip the device step phase")
    p.add_argument(
        "--workers-mode", "--workers_mode", type=str, default="both",
        choices=["thread", "process", "both"],
        help="worker pool kind to measure; 'both' benches thread-vs-process "
        "head-to-head (reference multi-process workers: "
        "scripts/data_loader/data_loader_utils.py:96-116)",
    )
    p.add_argument(
        "--device-aug", "--device_aug", action="store_true",
        help="measure the PLAN-mode loader (on-device augmentation, "
        "data/device_augment.py): workers emit geometry+labels only; the "
        "pixel work that dominates the host path moves into the train jit. "
        "copy_paste is zeroed (host-only feature; see "
        "DetectionDataset.device_aug_ineligible)",
    )
    p.add_argument(
        "--cache", type=str, default="dynamic_mem",
        choices=["cfg", "none", "mem", "dynamic_mem", "disk", "dynamic_disk"],
        help="image cache for the steady-state measurement (epoch 1 pays "
        "decode once; every later epoch reads the decoded-at-target-size "
        "cache). 'cfg' = whatever the train cfg says",
    )
    return p


def bench_loader(loader, n_batches: int) -> float:
    it = iter(loader)
    next(it)  # warm caches / thread spin-up outside the timed window
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        try:
            batch = next(it)
        except StopIteration:
            it.close()
            it = iter(loader)
            batch = next(it)
        # plan-mode batches carry no pixels (images is None) — count n_real
        n += batch.images.shape[0] if batch.images is not None else batch.n_real
    dt = time.perf_counter() - t0
    it.close()  # join worker threads before interpreter teardown
    return n / dt


def bench_step(model_cfg: str, nc: int, train_cfg: dict, batch_size: int,
               img_size: int, max_labels: int, n_iters: int) -> float:
    """Device-only step throughput on a synthetic resident batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.train.trainer import YoloTrainer

    class _SyntheticDataset:
        labels = [np.zeros((0, 5), np.float32)]

    class _SyntheticLoader:
        """Minimal loader stand-in: enough surface for YoloTrainer init."""

        dataset = _SyntheticDataset()

        def __len__(self):
            return n_iters

    cfg = dict(train_cfg)
    cfg["train"] = dict(train_cfg["train"], image_size=img_size,
                        batch_size=batch_size, epochs=1, plot=False)
    model = build_model(model_cfg, dtype=jnp.bfloat16, nc=nc)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=img_size)
    trainer = YoloTrainer(model, variables, cfg, _SyntheticLoader(),
                          val_loader=None, log_dir="/tmp/bench_loader_run")

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch_size, img_size, img_size, 3), dtype=np.uint8))
    targets = jnp.zeros((batch_size * max_labels, 6), jnp.float32)
    mask = jnp.zeros((batch_size * max_labels,), bool)

    state = trainer.state

    def run(state, n: int) -> Tuple[float, object]:
        t0 = time.perf_counter()
        items = None
        for _ in range(n):
            state, items = trainer._train_step(state, images, targets, mask)
        float(jnp.sum(items))  # hard sync (see bench.py methodology note)
        return time.perf_counter() - t0, state

    _, state = run(state, 1)  # compile
    t1, state = run(state, 1)
    tn, state = run(state, n_iters + 1)
    return batch_size * n_iters / (tn - t1)


def main() -> int:
    args = get_parser().parse_args()

    from ayolov2_tpu.data import DataLoader, DetectionDataset
    from ayolov2_tpu.utils.config import load_yaml

    data_cfg = load_yaml(args.data)
    train_cfg = load_yaml(args.cfg)
    tcfg = train_cfg["train"]
    batch_size = args.batch_size or int(tcfg["batch_size"])
    img_size = args.img_size or int(tcfg["image_size"])
    workers = int(tcfg.get("workers", 4)) if args.workers < 0 else args.workers

    dataset = DetectionDataset(
        data_cfg["train_path"],
        img_size=img_size,
        batch_size=batch_size,
        cache_images=(
            tcfg.get("cache_image") if args.cache == "cfg"
            else None if args.cache == "none" else args.cache
        ),
        # the train cfg's label_type is COCO-oriented ("segments"); fall back
        # to the dataset-derived rule (cli/val.py) so a VOC data cfg actually
        # loads its labels/ dir — r2's measurement silently ran label-free
        label_type=(
            "segments" if str(data_cfg.get("dataset", "")).lower() == "coco" else "labels"
        )
        if str(data_cfg.get("dataset", ""))
        else str(tcfg.get("label_type", "labels")),
        yolo_augmentation={**train_cfg["hyper_params"], **train_cfg["yolo_augmentation"]},
        augmentation=train_cfg.get("augmentation"),
    )
    if args.device_aug:
        # zero the host-only features so the config is plan-eligible
        # (copy_paste interleaves RNG with pixel reads; Blur-family policies
        # are pixel-only) — flips stay, everything else is unchanged
        dataset.yolo_augmentation["copy_paste"] = 0.0
        if isinstance(dataset.yolo_augmentation.get("copy_paste2"), dict):
            dataset.yolo_augmentation["copy_paste2"]["p"] = 0.0
        if dataset.policies is not None:
            kept = []
            for pol in dataset.policies.policies:
                names = {k: v for k, v in pol.get("policy", {}).items()
                         if k in ("HorizontalFlip", "VerticalFlip")}
                if names:
                    kept.append({**pol, "policy": names})
            dataset.policies.policies = kept
        dataset.enable_device_aug(resident=True)
    modes = ["thread", "process"] if args.workers_mode == "both" else [args.workers_mode]
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True, drop_last=True,
                        workers=workers, workers_mode=modes[0])
    if len(loader) == 0:
        LOGGER.error("dataset too small for batch_size=%d", batch_size)
        return 1

    # cold pass = epoch-1 cost (JPEG decode + resize per sample, filling the
    # cache); steady state = every later epoch (decoded-at-target-size reads)
    cold_img_s = bench_loader(loader, args.batches)
    per_mode = {}
    for mode in modes:
        mode_loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                                 drop_last=True, workers=workers, workers_mode=mode)
        per_mode[mode] = (
            bench_loader(mode_loader, args.batches) if args.cache != "none" else cold_img_s
        )
        LOGGER.info(
            "loader[%s]: %.1f img/s steady-state (workers=%d, cache=%s)",
            mode, per_mode[mode], workers, args.cache,
        )
    best_mode = max(per_mode, key=per_mode.get)
    loader_img_s = per_mode[best_mode]
    LOGGER.info("loader: %.1f img/s steady-state (best mode=%s), %.1f img/s cold",
                loader_img_s, best_mode, cold_img_s)

    report = {
        "loader_img_s": round(loader_img_s, 1),
        "loader_cold_img_s": round(cold_img_s, 1),
        "loader_by_mode_img_s": {m: round(v, 1) for m, v in per_mode.items()},
        "best_workers_mode": best_mode,
        "cache": args.cache,
        "device_aug": bool(args.device_aug),
        "workers": workers,
        "batch_size": batch_size,
        "img_size": img_size,
    }
    if not args.no_step:
        step_img_s = bench_step(
            args.model, int(data_cfg["nc"]), train_cfg, batch_size, img_size,
            int(tcfg.get("max_labels_per_image", 64)), args.batches,
        )
        LOGGER.info("train step: %.1f img/s (device-resident synthetic batch)", step_img_s)
        report["step_img_s"] = round(step_img_s, 1)
        report["bottleneck"] = "loader" if loader_img_s < step_img_s else "device"

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())

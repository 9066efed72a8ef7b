"""Benchmark matrix: the BASELINE.md config list on one chip.

Covers the benchmark configurations BASELINE.md names: yolov5s serve
(same metric as bench.py), TTA serve, Tucker-decomposed serve, and the
full training step. Prints one JSON line per config:

    {"metric": ..., "value": ..., "unit": "images/sec/chip"}

Methodology: chained iterations ending in a D2H hard sync with the
single-iteration latency subtracted (the tunneled backend's
block_until_ready returns early — see bench.py).

Usage: python cli/bench_matrix.py [--configs serve tta decomposed train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

BATCH, SIZE = 32, 640
MODEL_CFG = "res/configs/model/yolov5s.yaml"

ROWS: list = []  # every emitted row, for the --out artifact


def _hard_time(fn, sync, iters=20):
    for _ in range(3):
        sync(fn())
    t0 = time.perf_counter()
    sync(fn())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for _ in range(iters + 1):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0 - t1) / iters


def _emit(name, t, batch=BATCH, **extra):
    row = {
        "metric": name, "value": round(batch / t, 2),
        "unit": "images/sec/chip", "ms_per_batch": round(t * 1e3, 2),
        **extra,
    }
    ROWS.append(row)
    print(json.dumps(row), flush=True)


def main() -> int:
    p = argparse.ArgumentParser(description="BASELINE.md benchmark matrix")
    p.add_argument("--configs", nargs="+",
                   default=["serve", "tta", "decomposed", "train", "latency"],
                   choices=["serve", "int8", "tta", "decomposed", "train", "latency",
                            "sweep", "h2d", "train_e2e"])
    p.add_argument("--model-cfg", type=str, default=MODEL_CFG,
                   help="model YAML for every config (family sweeps: "
                        "yolov5m/l/x — weights are passed as a traced jit "
                        "argument so large models stay under the remote "
                        "compiler's payload limit)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--sweep-batch-sizes", type=int, nargs="+", default=[32, 64, 128],
                   help="batch sizes for the serve operating-point sweep")
    p.add_argument("--sweep-prefilters", nargs="+", default=["exact", "approx"],
                   choices=["exact", "approx"],
                   help="objectness-prefilter variants to sweep (restricting "
                        "to one halves the number of tunnel compiles)")
    p.add_argument("--out", type=str, default="",
                   help="also write every row to this JSON file (committed "
                        "evidence artifact, runs/bench_matrix/*.json)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ayolov2_tpu.models import build_model, fuse_params, init_model
    from ayolov2_tpu.models.yolo_head import YOLOHead
    from ayolov2_tpu.ops.nms import flat_grid_meta, flatten_raw_maps, fused_decode_nms

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))

    model_cfg = args.model_cfg
    name = Path(model_cfg).stem
    unfused = build_model(model_cfg, dtype=jnp.bfloat16)
    variables = init_model(unfused, jax.random.PRNGKey(0), img_size=SIZE)
    fused_vars = fuse_params(variables)
    nms_kw = dict(conf_thres=0.001, iou_thres=0.65, nms_box=512, pre_top_k=512,
                  keep_top_k=100, multi_label=False)

    def serving_fn(model, fvars, **nms_overrides):
        head = YOLOHead(nc=model.nc, anchors=model.anchors, strides=model.strides)
        grid_xy, anchor_wh, stride = (
            jnp.asarray(v)
            for v in flat_grid_meta(model.strides, head.anchor_grid(), (SIZE, SIZE))
        )
        kw = {**nms_kw, **nms_overrides}

        @jax.jit
        def serve_traced(v, images):
            imgs = images.astype(jnp.bfloat16) / 255.0
            raw = model.apply(v, imgs, training=True)
            return fused_decode_nms(flatten_raw_maps(raw), grid_xy, anchor_wh, stride, **kw)

        return lambda images: serve_traced(fvars, images)

    sync_det = lambda r: float(jnp.sum(r[0]))

    if "serve" in args.configs:
        model = build_model(model_cfg, dtype=jnp.bfloat16, fused=True)
        serve = serving_fn(model, fused_vars)
        _emit(f"{name}_640_bs32_serve", _hard_time(lambda: serve(images), sync_det, args.iters))

    if "int8" in args.configs:
        # int8 PTQ serving path (compress/quantize): s8 x s8 -> s32 convs,
        # 2x the bf16 MXU rate on v5e. Synthetic-batch calibration —
        # throughput only (accuracy deltas recorded in STATUS.md).
        from ayolov2_tpu.compress.quantize import quantize_model

        calib = [images.astype(jnp.bfloat16) / 255.0]
        qmodel, qvars = quantize_model(model_cfg, fused_vars, calib, dtype=jnp.bfloat16)
        serve_q = serving_fn(qmodel, qvars)
        _emit(f"{name}_640_bs32_serve_int8", _hard_time(lambda: serve_q(images), sync_det, args.iters))

    if "sweep" in args.configs:
        # VERDICT r3 task 3: serve operating-point sweep — the north-star
        # metric is images/sec/chip, not images/sec-at-bs32; decode/NMS and
        # per-dispatch overhead amortize with batch. bs32 stays the
        # reference-harness parity row (torchscript_runner/main.cpp:29-48).
        model = build_model(model_cfg, dtype=jnp.bfloat16, fused=True)
        for prefilter in args.sweep_prefilters:
            serve_fn = serving_fn(model, fused_vars,
                                  approx_prefilter=(prefilter == "approx"))
            for bs in args.sweep_batch_sizes:
                imgs_b = jnp.asarray(
                    rng.integers(0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))
                t = _hard_time(lambda: serve_fn(imgs_b), sync_det, args.iters)
                _emit(f"{name}_640_bs{bs}_serve_{prefilter}", t, batch=bs,
                      batch_size=bs, prefilter=prefilter)

    if "latency" in args.configs:
        # p50 end-to-end latency (BASELINE.md metric trio), bs=1: each call
        # individually hard-synced; the pure tunnel/sync round-trip (timed
        # on a 1-element read) is reported alongside so the device-side p50
        # can be separated from transport.
        model = build_model(model_cfg, dtype=jnp.bfloat16, fused=True)
        serve1 = serving_fn(model, fused_vars)
        img1 = images[:1]
        one = jnp.zeros((1,), jnp.float32)
        for _ in range(3):
            sync_det(serve1(img1))
        samples, rtts = [], []
        for _ in range(30):
            t0 = time.perf_counter()
            sync_det(serve1(img1))
            samples.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(one))
            rtts.append(time.perf_counter() - t0)
        p50 = float(np.median(samples))
        rtt = float(np.median(rtts))
        row = {
            "metric": f"{name}_640_bs1_p50_latency_ms",
            "value": round(p50 * 1e3, 2),
            "unit": "ms",
            "sync_rtt_ms": round(rtt * 1e3, 2),
            "p50_minus_rtt_ms": round((p50 - rtt) * 1e3, 2),
        }
        ROWS.append(row)
        print(json.dumps(row), flush=True)

    if "h2d" in args.configs:
        # VERDICT r4 weak #6 / task 4: END-TO-END serving with input
        # transfer. The device-only rows create the batch on device once;
        # a real server pays H2D per batch (the reference's TrtWrapper
        # pipelines pagelocked H2D, tensorrt_runner.py:122-332). Two rows
        # per batch size: overlapped (double-buffered device_put — batch
        # i+1 transfers while batch i computes) and serial (hard sync
        # between transfer and compute). CAVEAT recorded in the row: through
        # the axon tunnel H2D pays the ~28 ms RTT + tunnel bandwidth, so
        # both rows UNDERSTATE directly-attached throughput.
        model = build_model(model_cfg, dtype=jnp.bfloat16, fused=True)
        serve_h = serving_fn(model, fused_vars)
        for bs in (32, 128):
            hosts = [
                np.ascontiguousarray(
                    rng.integers(0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))
                for _ in range(2)
            ]
            # warm the compile at this batch size
            sync_det(serve_h(jnp.asarray(hosts[0])))

            def run_overlap(n=args.iters):
                # the production API is what gets timed: serve_stream's
                # depth-2 double buffering (parallel/serve.py)
                from ayolov2_tpu.parallel import serve_stream

                t0 = time.perf_counter()
                det = None
                stream = serve_stream(
                    serve_h, (hosts[i % 2] for i in range(n)), depth=2)
                for det, _ in stream:
                    pass
                float(jnp.sum(det))
                return (time.perf_counter() - t0) / n

            def run_serial(n=args.iters):
                t0 = time.perf_counter()
                for i in range(n):
                    cur = jax.device_put(hosts[i % 2])
                    jax.block_until_ready(cur)
                    det, _ = serve_h(cur)
                    float(jnp.sum(det))  # hard sync each iter
                return (time.perf_counter() - t0) / n

            run_overlap(3)
            t_ov = run_overlap()
            run_serial(3)
            t_se = run_serial()
            for tag, t in (("overlap", t_ov), ("serial", t_se)):
                _emit(f"{name}_640_bs{bs}_e2e_h2d_{tag}", t, batch=bs,
                      batch_size=bs, h2d="double-buffered" if tag == "overlap" else "per-iter sync",
                      caveat="tunnel RTT (~28ms) + tunnel bandwidth inflate H2D; "
                             "understates directly-attached e2e")

    if "train_e2e" in args.configs:
        # VERDICT r4 task 5: what training ACTUALLY achieves end-to-end —
        # the real DataLoader feeding the real jitted train step, overlapped
        # (the loader prefetches in worker threads while the device steps).
        # Rows: host-augmentation loader vs on-device augmentation
        # (data/device_augment.py) on the fixture VOC set. The gap between
        # these rows and the synthetic 'train' row is the loader wall.
        from ayolov2_tpu.data import DataLoader, DetectionDataset
        from ayolov2_tpu.loss import ComputeLoss
        from ayolov2_tpu.train.optimizer import build_optimizer
        from ayolov2_tpu.train.train_state import create_train_state, make_train_step
        from ayolov2_tpu.utils.config import load_yaml

        voc = "/root/reference/tests/res/datasets/VOC/images/train"
        tr_size = int(os.environ.get("AYOLO_TRAIN_E2E_SIZE", 320))
        tr_bs = int(os.environ.get("AYOLO_TRAIN_E2E_BS", 16))
        cfg_all = load_yaml("res/configs/cfg/train_config.yaml")
        ya = dict(cfg_all.get("yolo_augmentation") or {})
        ya.update(augment=True, mosaic=1.0, mixup=0.0, copy_paste=0.0)
        ya["copy_paste2"] = {"p": 0.0}

        from ayolov2_tpu.models import init_model

        model = build_model(model_cfg, dtype=jnp.bfloat16)
        var_tr = init_model(model, jax.random.PRNGKey(0), img_size=tr_size)
        hyp = {"optimizer_params": {"lr": 0.01}, "box": 0.05, "cls": 0.5, "obj": 1.0,
               "cls_pw": 1.0, "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
               "label_smoothing": 0.0, "weight_decay": 5e-4, "lrf": 0.1,
               "momentum": 0.937, "warmup_epochs": 3.0, "warmup_momentum": 0.8,
               "warmup_bias_lr": 0.1}
        loss_fn = ComputeLoss.from_hyp(model.head.stride_anchors(), model.nc, hyp)
        tx = build_optimizer(var_tr["params"], hyp, epochs=300, steps_per_epoch=100,
                             batch_size=tr_bs)
        step = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.bfloat16))

        modes = tuple(
            os.environ.get("AYOLO_TRAIN_E2E_MODES", "host,device").split(","))
        last_batch = None
        for mode in modes:
            ds = DetectionDataset(voc, img_size=tr_size, batch_size=tr_bs,
                                  rect=False, stride=32, cache_images="mem",
                                  yolo_augmentation=ya)
            if mode == "device":
                ds.enable_device_aug(resident=True)
                from ayolov2_tpu.data.device_augment import DeviceAugmenter

                augmenter = DeviceAugmenter(tr_size, tr_size, 1,
                                            resident_frames=ds.resident_frames)
            loader = DataLoader(ds, batch_size=tr_bs, shuffle=True,
                                drop_last=True, workers=2)
            state = create_train_state(var_tr, tx)
            # one warmup epoch compiles step (+ renderer) and fills caches;
            # raise AYOLO_TRAIN_E2E_EPOCHS when bs approaches the fixture
            # size (99 imgs) so enough batches land in the timed window
            n_epochs = int(os.environ.get("AYOLO_TRAIN_E2E_EPOCHS", 3))
            n_img = 0
            t0 = None
            items = None
            for epoch in range(n_epochs):
                for batch in loader:
                    imgs = augmenter(batch) if mode == "device" else jnp.asarray(batch.images)
                    state, items = step(state, imgs, jnp.asarray(batch.targets),
                                        jnp.asarray(batch.target_mask))
                    last_batch = batch
                    if t0 is not None:
                        n_img += tr_bs
                if epoch == 0:  # timing starts after the compile epoch
                    float(jnp.sum(items))
                    t0 = time.perf_counter()
            float(jnp.sum(items))  # hard sync
            dt = time.perf_counter() - t0
            row = {
                "metric": f"{name}_{tr_size}_bs{tr_bs}_train_e2e_{mode}_aug",
                "value": round(n_img / dt, 2),
                "unit": "images/sec/chip",
                "epochs_timed": n_epochs - 1,
                "note": "real loader + real step, overlapped (2 workers); "
                        f"{mode}-side augmentation",
            }
            ROWS.append(row)
            print(json.dumps(row), flush=True)

        # step-only denominator at the SAME size/bs: device-resident inputs,
        # chained iterations — the ceiling the e2e rows are chasing. The gap
        # between device_aug e2e and this row is the remaining input-pipeline
        # cost (plan H2D + renderer not hidden by the step).
        if last_batch is not None:
            imgs_r = jnp.asarray(
                np.random.default_rng(0).integers(
                    0, 255, (tr_bs, tr_size, tr_size, 3), dtype=np.uint8
                ).astype(np.float32))
            tgts_r = jnp.asarray(last_batch.targets)
            mask_r = jnp.asarray(last_batch.target_mask)
            state = create_train_state(var_tr, tx)

            def _step_only():
                _, it = step(state, imgs_r, tgts_r, mask_r)
                return it

            t = _hard_time(_step_only, lambda r: float(jnp.sum(r)),
                           iters=args.iters)
            row = {
                "metric": f"{name}_{tr_size}_bs{tr_bs}_train_step_only",
                "value": round(tr_bs / t, 2),
                "unit": "images/sec/chip",
                "ms_per_batch": round(t * 1e3, 2),
                "note": "device-resident inputs, chained iters — the e2e ceiling",
            }
            ROWS.append(row)
            print(json.dumps(row), flush=True)

        # renderer-only attribution row: the device time the aug program
        # itself costs per batch (chained iters on the last PlanBatch). The
        # e2e gap = this + plan H2D + dispatch not hidden by the loader.
        if "device" in modes and last_batch is not None and last_batch.images is None:
            pb = last_batch
            dt_name = np.dtype(augmenter.dtype).name
            t = _hard_time(lambda: augmenter(pb), lambda r: float(jnp.sum(r)),
                           iters=args.iters)
            row = {
                "metric": f"{name}_{tr_size}_bs{tr_bs}_render_only_{dt_name}",
                "value": round(tr_bs / t, 2),
                "unit": "images/sec/chip",
                "ms_per_batch": round(t * 1e3, 2),
                "render_mode": augmenter.mode,
                "note": "device-aug renderer alone (chained iters, resident frames)",
            }
            ROWS.append(row)
            print(json.dumps(row), flush=True)

    if "tta" in args.configs:
        from ayolov2_tpu.ops.tta import inference_with_tta

        model = build_model(model_cfg, dtype=jnp.bfloat16, fused=True)

        @jax.jit
        def tta_traced(v, images):
            imgs = images.astype(jnp.bfloat16) / 255.0

            def fwd(x):
                dec, _ = model.apply(v, x, training=False)
                return dec

            return inference_with_tta(fwd, imgs, nl=len(model.strides), gs=int(max(model.stride)))

        tta = lambda images: tta_traced(fused_vars, images)

        _emit(f"{name}_640_bs32_tta_serve",
              _hard_time(lambda: tta(images), lambda r: float(jnp.sum(r)), args.iters))

    if "decomposed" in args.configs:
        from ayolov2_tpu.compress.decomposition import decompose_model

        dmap, dparams, _ = decompose_model(
            {"params": variables["params"]}["params"], loss_thr=0.1, n_test=64,
        )
        dmodel = build_model(model_cfg, dtype=jnp.bfloat16, fused=True,
                             decompose_map=tuple((k, tuple(v)) for k, v in dmap.items()))
        dfused = fuse_params({"params": dparams, "batch_stats": variables.get("batch_stats", {})})
        serve_d = serving_fn(dmodel, dfused)
        _emit(f"{name}_640_bs32_decomposed_serve",
              _hard_time(lambda: serve_d(images), sync_det, args.iters))

    if "train" in args.configs:
        from ayolov2_tpu.loss import ComputeLoss
        from ayolov2_tpu.train.optimizer import build_optimizer
        from ayolov2_tpu.train.train_state import create_train_state, make_train_step

        model = build_model(model_cfg, dtype=jnp.bfloat16)
        hyp = {"optimizer_params": {"lr": 0.01}, "box": 0.05, "cls": 0.5, "obj": 1.0,
               "cls_pw": 1.0, "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
               "label_smoothing": 0.0, "weight_decay": 5e-4, "lrf": 0.1,
               "momentum": 0.937, "warmup_epochs": 3.0, "warmup_momentum": 0.8,
               "warmup_bias_lr": 0.1}
        loss_fn = ComputeLoss.from_hyp(model.head.stride_anchors(), model.nc, hyp)
        tx = build_optimizer(variables["params"], hyp, epochs=300, steps_per_epoch=100,
                             batch_size=BATCH)
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, loss_fn, tx, image_dtype=jnp.bfloat16))
        targets = np.zeros((BATCH * 64, 6), np.float32)
        mask = np.zeros((BATCH * 64,), bool)
        for i in range(BATCH):
            targets[i] = [i, i % model.nc, 0.5, 0.5, 0.25, 0.25]
            mask[i] = True
        targets, mask = jnp.asarray(targets), jnp.asarray(mask)

        box = {"state": state}

        def run_step():
            box["state"], items = step(box["state"], images, targets, mask)
            return items

        _emit(f"{name}_640_bs32_train_step",
              _hard_time(run_step, lambda r: float(jnp.sum(r)), args.iters))

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({
            "device": jax.devices()[0].platform,
            "rows": ROWS,
        }, indent=1))
        print(f"wrote {len(ROWS)} rows to {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: yolov5s serving path (uint8 in -> NMS'd boxes out) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full on-device pipeline the reference benchmarks with TensorRT
(cpp/src/torchscript_runner/main.cpp:20-51 runs 137 iterations of a
(32,3,640,640) fp16 forward): here it's letterboxed uint8 batch -> /255 ->
fused-conv bf16 forward -> decode -> batched NMS -> fixed (bs, 100, 6)
detections, all inside one jit.

vs_baseline compares against 1000 images/sec — a conservative estimate of
A100 TensorRT fp16 yolov5s end-to-end throughput at batch 32 (the
BASELINE.json north star is >2x this on a v5e chip; the reference publishes
no hard number, README.md:275 reports 21.2 ms/img for yolov5x on an
unspecified GPU).

Robustness (VERDICT r2 task 1): the measurement runs in a child process
under a watchdog. If the child hangs past the deadline — the classic
signature of a stale process still holding the axon tunnel (CLAUDE.md: the
tunnel serializes clients; a second client's compile just blocks) — the
parent prints diagnostics (including any other python processes that may
hold the tunnel) and retries once. The child emits timestamped progress
markers to stderr so a timeout tail shows exactly where it died.
"""

import json
import os
import subprocess
import sys
import time

A100_TRT_YOLOV5S_IMG_PER_SEC = 1000.0  # documented estimate, see module docstring

# bs128 is the best measured operating point for images/sec/chip (the
# north-star metric): the round-4 sweep (runs/bench_matrix/matrix_r4.json)
# measured 2235 / 2541 / 3286 img/s at bs 32 / 64 / 128 with the approx
# prefilter — decode/NMS and dispatch overhead amortize with batch. The
# reference's bs32 TRT-harness operating point stays recorded in
# cli/bench_matrix.py; override here with AYOLO_BENCH_BATCH=32 to compare.
BATCH = int(os.environ.get("AYOLO_BENCH_BATCH", 128))
SIZE = 640
WARMUP = 3
ITERS = 20
# One attempt must comfortably cover a COLD compile through the tunnel
# (~1-4 min for yolov5s@640) yet leave room for a retry inside the
# driver's budget; the persistent compile cache (prewarmed at round end)
# makes the normal case ~60-90 s total.
CHILD_TIMEOUT_S = float(os.environ.get("AYOLO_BENCH_CHILD_TIMEOUT", 260))
# The retry gets a longer leash: a tunnel waking from idle/wedged state was
# measured adding ~90 s to even a trivial first jit (2026-08-19), so a cold
# run that misses the first window usually fits a 1.75x second one (the
# first attempt itself warms the tunnel/cache).
CHILD_TIMEOUT2_S = float(
    os.environ.get("AYOLO_BENCH_CHILD_TIMEOUT2", CHILD_TIMEOUT_S * 1.75)
)


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def child_main() -> None:
    # Die with the parent: if the parent is killed (driver timeout, outer
    # `timeout N`), an orphaned child would keep holding the axon tunnel and
    # block every subsequent bench/compile on this host — the round-2
    # BENCH_r02 rc=124 failure mode. PR_SET_PDEATHSIG delivers SIGKILL to
    # this process the moment the parent exits.
    try:
        import ctypes
        import signal as _signal

        ctypes.CDLL("libc.so.6", use_errno=True).prctl(1, _signal.SIGKILL)
    except Exception:
        pass
    from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

    _jax_setup()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ayolov2_tpu.models import build_model, fuse_params
    from ayolov2_tpu.models.yolo_head import YOLOHead
    from ayolov2_tpu.ops.nms import flat_grid_meta, flatten_raw_maps, fused_decode_nms

    _log(f"backend={jax.default_backend()} devices={len(jax.devices())}")

    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.bfloat16, fused=True)
    # fused-conv params: init unfused stats then fold (serving-path parity with
    # the reference's model.fuse() before val/export)
    unfused = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.bfloat16)
    variables = unfused.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8), training=False)
    fused = fuse_params(variables)
    _log("model built + params fused")

    head = YOLOHead(nc=model.nc, anchors=model.anchors, strides=model.strides)
    grid_xy, anchor_wh, stride = (
        jnp.asarray(v) for v in flat_grid_meta(model.strides, head.anchor_grid(), (SIZE, SIZE))
    )

    # A/B flag: AYOLO_INT8=1 serves the post-training-quantized int8-conv
    # graph (compress/quantize; the v5e MXU runs s8xs8 at 2x the bf16 rate).
    # PTQ on one synthetic batch — throughput measurement only; accuracy
    # calibration uses real images via `cli/export.py --dtype int8`.
    if os.environ.get("AYOLO_INT8", "0") == "1":
        from ayolov2_tpu.compress.quantize import quantize_model

        calib = [
            jnp.asarray(
                rng_c.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
                .astype(np.float32) / 255.0,
                jnp.bfloat16,
            )
            for rng_c in [np.random.default_rng(7)]
        ]
        model, fused = quantize_model(
            "res/configs/model/yolov5s.yaml", fused, calib, dtype=jnp.bfloat16
        )
        _log("int8 serving path ON (synthetic-batch PTQ)")

    # A/B flag: AYOLO_EARLY_PIPELINE=1 routes layers 0..3 through the fused
    # Pallas early-network kernel (ops/early_pipeline.py) instead of XLA.
    use_early = os.environ.get("AYOLO_EARLY_PIPELINE", "0") == "1"
    early_strip_h = int(os.environ.get("AYOLO_EARLY_STRIP_H", "10"))
    if use_early:
        from ayolov2_tpu.ops.early_pipeline import (
            can_fuse_early, early_pipeline, extract_early_params,
        )

        assert os.environ.get("AYOLO_INT8", "0") != "1", "early-pipeline A/B is float-only"
        assert can_fuse_early(model.specs)
        ep = extract_early_params(fused)
        _log(f"early-pipeline path ON (strip_h={early_strip_h})")

    @jax.jit
    def serve(images):
        # fused serving path: bf16 backbone -> obj prefilter on raw logits ->
        # fp32 decode of the surviving 1000 rows only -> fixed-shape NMS
        if use_early:
            act = early_pipeline(images, ep, strip_h=early_strip_h)
            raw = model.apply(fused, act, training=True, start_layer=4)
        else:
            imgs = images.astype(jnp.bfloat16) / 255.0
            raw = model.apply(fused, imgs, training=True)
        det, n = fused_decode_nms(
            flatten_raw_maps(raw),
            grid_xy, anchor_wh, stride,
            conf_thres=0.001,
            iou_thres=0.65,
            # obj prefilter = the TRT plugin's topK=512 (model_converter.py:
            # 330-340); the reference's own batched_nms defaults to 500
            nms_box=512,
            pre_top_k=512,
            keep_top_k=100,
            multi_label=False,
            # Serving default: TPU-optimized approximate objectness prefilter
            # (lax.approx_max_k, recall 0.99). Measured on real trained
            # outputs (99 fixture images, memorization ckpt): ZERO keep-set
            # change above conf 0.01; +2 detections of 9756 in the
            # 0.001-0.01 tail. +4% e2e. AYOLO_APPROX_PREFILTER=0 forces the
            # exact TRT-plugin semantics (library/validator default).
            approx_prefilter=os.environ.get("AYOLO_APPROX_PREFILTER", "1") == "1",
        )
        return det, n

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))

    # NOTE on methodology: through the tunneled TPU backend,
    # block_until_ready can return before device completion — only a D2H
    # read is a true barrier. Measure with a hard sync and subtract the
    # single-iteration launch+sync latency.
    def run(n: int) -> float:
        t0 = time.perf_counter()
        det = None
        for _ in range(n):
            det, _n = serve(images)
        float(jnp.sum(det))  # hard sync
        return time.perf_counter() - t0

    _log("compiling serve graph (first run)...")
    run(1)
    _log("compiled; warming up")
    for _ in range(WARMUP - 1):
        run(1)
    t1 = run(1)
    tn = run(ITERS + 1)
    dt = tn - t1
    _log(f"measured: {ITERS} chained iters in {dt:.3f}s")

    # opt-in device-level trace of the warm serve loop (AYOLO_TRACE_DIR):
    # runs AFTER the measurement so the headline number stays clean
    from ayolov2_tpu.utils.profiling import maybe_trace, trace_dir

    if trace_dir():
        with maybe_trace("serve"):
            run(4)
        _log(f"serve trace written under {trace_dir('serve')}")

    img_per_sec = BATCH * ITERS / dt
    result = {
        "metric": f"yolov5s_{SIZE}_bs{BATCH}_serve_images_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / A100_TRT_YOLOV5S_IMG_PER_SEC, 3),
        # the denominator is a bs32 A100-TRT ESTIMATE; the fields below keep
        # the cross-operating-point comparison self-describing (VERDICT r4
        # weak #5) and record what a host-fed server would see (weak #6)
        "baseline_note": "denominator=1000 img/s A100-TRT bs32 estimate",
    }

    # the secondary points below are skipped when the headline measurement
    # already ate most of the watchdog budget (cold compile through the
    # tunnel) — the headline JSON line must always make it out
    budget_left = lambda: (time.perf_counter() - _T0) < float(
        os.environ.get("AYOLO_BENCH_SECONDARY_DEADLINE", 150)
    )

    # secondary point 1: the reference-harness bs32 operating point
    # (torchscript_runner/main.cpp:29-48 benches (32,3,640,640)); skipped
    # gracefully if its compile would blow the watchdog budget
    if BATCH != 32 and budget_left() and os.environ.get("AYOLO_BENCH_BS32", "1") == "1":
        try:
            imgs32 = jnp.asarray(rng.integers(0, 255, (32, SIZE, SIZE, 3), dtype=np.uint8))

            def run32(n: int) -> float:
                t0 = time.perf_counter()
                det = None
                for _ in range(n):
                    det, _n = serve(imgs32)
                float(jnp.sum(det))
                return time.perf_counter() - t0

            _log("compiling bs32 point...")
            run32(1)
            for _ in range(WARMUP - 1):
                run32(1)
            t1_32 = run32(1)
            dt32 = run32(ITERS + 1) - t1_32
            result["bs32_value"] = round(32 * ITERS / dt32, 2)
            result["bs32_vs_baseline"] = round(
                result["bs32_value"] / A100_TRT_YOLOV5S_IMG_PER_SEC, 3
            )
            _log(f"bs32 point: {result['bs32_value']} img/s")
        except Exception as e:  # secondary points must never kill the headline
            _log(f"bs32 point failed: {e}")

    # secondary point 2: END-TO-END with input transfer — each iteration's
    # uint8 batch is device_put from host memory, double-buffered so batch
    # i+1 transfers while batch i computes (the reference's TrtWrapper
    # pipelines pagelocked H2D the same way, tensorrt_runner.py:122-332).
    # Through the axon tunnel the H2D path pays the ~28 ms RTT + tunnel
    # bandwidth, so this UNDERSTATES directly-attached e2e throughput.
    if budget_left() and os.environ.get("AYOLO_BENCH_E2E", "1") == "1":
        try:
            host_batches = [
                np.ascontiguousarray(
                    rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
                )
                for _ in range(2)
            ]

            def run_e2e(n: int) -> float:
                t0 = time.perf_counter()
                det = None
                cur = jax.device_put(host_batches[0])
                for i in range(n):
                    nxt = jax.device_put(host_batches[(i + 1) % 2])  # overlap H2D
                    det, _n = serve(cur)
                    cur = nxt
                float(jnp.sum(det))
                return time.perf_counter() - t0

            for _ in range(WARMUP):
                run_e2e(1)
            t1e = run_e2e(1)
            dte = run_e2e(ITERS + 1) - t1e
            result["e2e_value"] = round(BATCH * ITERS / dte, 2)
            result["e2e_note"] = "host-fed, double-buffered device_put; tunnel RTT inflates H2D"
            _log(f"e2e (host-fed, overlapped H2D) point: {result['e2e_value']} img/s")
        except Exception as e:
            _log(f"e2e point failed: {e}")

    print(json.dumps(result), flush=True)


def _diagnose(attempt: int, elapsed: float) -> None:
    limit = CHILD_TIMEOUT_S if attempt == 1 else CHILD_TIMEOUT2_S
    _log(
        f"attempt {attempt} hit the {limit:.0f}s watchdog after "
        f"{elapsed:.0f}s — likely another process holds the axon tunnel "
        "(the tunnel serializes clients; a held tunnel makes compiles block "
        "indefinitely)"
    )
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,etime,rss,cmd"], capture_output=True, text=True, timeout=10
        ).stdout
        procs = [
            l for l in out.splitlines()
            if "python" in l and "bench.py" not in l and "ps -eo" not in l
        ]
        if procs:
            _log("other python processes (possible tunnel holders):")
            for l in procs[:15]:
                print("    " + l, file=sys.stderr, flush=True)
    except Exception as e:  # diagnostics must never break the bench
        _log(f"process scan failed: {e}")


def _relay_alive() -> bool:
    """True if the axon tunnel relay is accepting connections.

    The relay (/root/.tpu_init.py) forwards localhost:8082.. to the external
    axon host and can die on external stdin EOF — after which every TPU
    compile hangs forever. Fail fast with a diagnosis instead of burning the
    driver's timeout (observed live this round)."""
    import socket

    for port in (8082, 8092, 8102, 8112):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def main() -> None:
    if "--child" in sys.argv:
        child_main()
        return

    if not _relay_alive():
        _log(
            "axon tunnel relay is DOWN (no listener on 8082/8092/8102/8112; "
            "/root/.tpu_init.py exited?) — the TPU is unreachable and any "
            "compile would hang. Failing fast."
        )
        sys.exit(3)

    for attempt in (1, 2):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=CHILD_TIMEOUT_S if attempt == 1 else CHILD_TIMEOUT2_S,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            _diagnose(attempt, time.perf_counter() - t0)
            _log("retrying once..." if attempt == 1 else "giving up")
            continue
        sys.stderr.write(proc.stderr or "")
        line = next(
            (l for l in (proc.stdout or "").splitlines() if l.startswith('{"metric"')), None
        )
        if line:
            print(line, flush=True)
            return
        _log(f"attempt {attempt}: child exited rc={proc.returncode} without a JSON line")
        sys.stderr.write((proc.stdout or "")[-2000:])
        if attempt == 1:
            _log("retrying once...")
    sys.exit(1)


if __name__ == "__main__":
    main()

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
"""

import json
import time

import numpy as np

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

A100_TRT_YOLOV5S_IMG_PER_SEC = 1000.0  # documented estimate, see module docstring

BATCH = 32
SIZE = 640
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ayolov2_tpu.models import build_model, fuse_params
    from ayolov2_tpu.models.yolo_head import YOLOHead
    from ayolov2_tpu.ops.nms import flat_grid_meta, flatten_raw_maps, fused_decode_nms

    model = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.bfloat16, fused=True)
    # fused-conv params: init unfused stats then fold (serving-path parity with
    # the reference's model.fuse() before val/export)
    unfused = build_model("res/configs/model/yolov5s.yaml", dtype=jnp.bfloat16)
    variables = unfused.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8), training=False)
    fused = fuse_params(variables)

    head = YOLOHead(nc=model.nc, anchors=model.anchors, strides=model.strides)
    grid_xy, anchor_wh, stride = (
        jnp.asarray(v) for v in flat_grid_meta(model.strides, head.anchor_grid(), (SIZE, SIZE))
    )

    @jax.jit
    def serve(images):
        # fused serving path: bf16 backbone -> obj prefilter on raw logits ->
        # fp32 decode of the surviving 1000 rows only -> fixed-shape NMS
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

    for _ in range(WARMUP):
        run(1)
    t1 = run(1)
    tn = run(ITERS + 1)
    dt = tn - t1

    img_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"yolov5s_{SIZE}_bs{BATCH}_serve_images_per_sec",
                "value": round(img_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / A100_TRT_YOLOV5S_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

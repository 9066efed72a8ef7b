"""Multi-chip data-parallel serving: one jitted program over a device mesh.

The reference scales inference by pinning one TRT engine per GPU process
(val.py --device / torchscript_runner per-device binaries); the TPU-native
shape is ONE program compiled over the whole mesh — XLA splits the batch
across chips over ICI, parameters stay replicated, and the fixed-shape
(bs, keep_top_k, 6) detections come back batch-sharded with zero
host-side gather logic.

Parameters are passed as a traced ARGUMENT (not closure-captured): keeps
the compile payload small for yolov5l/x through the remote-compile service
(CLAUDE.md: >150MB HLO constants are rejected) and lets the same compiled
program serve updated weights (e.g. after SWA/EMA swap) without a recompile.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
from jax.sharding import Mesh

from ayolov2_tpu.parallel.mesh import batch_sharding, replicate


def make_sharded_serving_fn(
    mesh: Mesh,
    model,
    variables: Dict[str, Any],
    conf_thres: float = 0.001,
    iou_thres: float = 0.65,
    top_k: int = 512,
    keep_top_k: int = 100,
    nms_box: int = 1000,
    image_dtype=None,
    img_hw: Optional[Tuple[int, int]] = None,
) -> Callable:
    """Build ``images -> (detections, counts)`` sharded over ``mesh``'s
    'data' axis.

    ``images`` must have a leading batch dim divisible by the mesh's data
    axis size. Uses the fused obj-prefilter decode+NMS serving graph when
    ``img_hw`` is given (the bench/export fast path), the plain decode+NMS
    path otherwise.
    """
    import jax.numpy as jnp

    from ayolov2_tpu.export.exporter import make_serving_fn

    dtype = image_dtype if image_dtype is not None else jnp.bfloat16
    core = make_serving_fn(
        model, None,
        conf_thres=conf_thres, iou_thres=iou_thres, top_k=top_k,
        keep_top_k=keep_top_k, nms_box=nms_box, include_nms=True,
        image_dtype=dtype, fused_decode=img_hw is not None, img_hw=img_hw,
    )
    rep = replicate(mesh)
    v_sharded = jax.device_put(variables, rep)
    sharded = jax.jit(
        core,
        in_shardings=(rep, batch_sharding(mesh, 4)),
        out_shardings=(batch_sharding(mesh, 3), batch_sharding(mesh, 1)),
    )

    def serve(images):
        n = mesh.shape["data"]
        assert images.shape[0] % n == 0, (
            f"batch {images.shape[0]} not divisible by data-axis size {n}"
        )
        return sharded(v_sharded, images)

    # exposed for compiled-structure assertions (tests inspect the HLO for
    # the expected collectives instead of trusting numeric parity alone)
    serve.jitted = sharded
    serve.variables = v_sharded
    return serve


def serve_stream(
    serve_fn: Callable,
    batches: Iterable,
    sharding=None,
    depth: int = 2,
) -> Iterator:
    """Pipelined host→device serving: overlap input transfer with compute.

    The reference's TensorRT wrapper explicitly pipelines pagelocked H2D
    copies behind engine execution (scripts/utils/tensorrt_runner.py:122-332);
    feeding a device-resident-only path from host memory serially instead
    costs the full transfer latency per batch. The TPU-native equivalent
    needs no pinned buffers or streams: ``jax.device_put`` is asynchronous,
    so enqueueing the NEXT batch's transfer *before* dispatching the CURRENT
    batch's program lets the DMA ride behind the compute. A ``depth``-deep
    queue keeps at most ``depth`` input batches device-resident — ``depth=2``
    is classic double buffering (measured +29% at bs32 / +54% at bs128 over
    per-batch serial transfer, runs/bench_matrix/h2d_r5.json); ``depth=1``
    degenerates to the serial schedule.

    Args:
        serve_fn: any device program over one batch — a jitted single-chip
            serving fn, or :func:`make_sharded_serving_fn`'s result.
        batches: iterable of host arrays (consumed lazily, e.g. a loader).
        sharding: optional ``Sharding`` for the transfers (pass the mesh's
            batch sharding when feeding a DP-sharded serve; ``None`` =
            default device placement).
        depth: in-flight input batches (>= 1).

    Yields ``serve_fn``'s result for each input batch, in order. Results
    are device arrays — the consumer decides when to pay the D2H read.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    q: deque = deque()
    for host in batches:
        q.append(jax.device_put(host, sharding))
        if len(q) >= depth:
            yield serve_fn(q.popleft())
    while q:
        yield serve_fn(q.popleft())


def make_latency_serving_fn(
    mesh: Mesh,
    model,
    variables: Dict[str, Any],
    conf_thres: float = 0.001,
    iou_thres: float = 0.65,
    top_k: int = 512,
    keep_top_k: int = 100,
    nms_box: int = 1000,
    image_dtype=None,
    img_hw: Optional[Tuple[int, int]] = None,
    axis: str = "data",
) -> Callable:
    """Spatially-partitioned serving: ONE image's FLOPs spread over the mesh.

    DP serving (:func:`make_sharded_serving_fn`) splits the *batch* — total
    throughput scales with chips, but each image still runs on one chip, so
    the bs-1 latency floor never moves. The TPU-native latency lever is
    SPATIAL partitioning (SP): shard the image HEIGHT dim over the mesh and
    let XLA's SPMD partitioner rewrite every convolution into a
    halo-exchanged sharded conv — each chip computes a horizontal slab,
    exchanging only the kernel-overlap rows with its neighbours via
    collective-permute over ICI. No model change, no hand-written
    collectives; the tiny decode+NMS tail all-gathers its (N, 5+nc) inputs
    and replicates.

    The GPU reference has no analogue — its TRT/torchscript engines are
    strictly single-device (cpp/src/torchscript_runner/main.cpp:29-48 pins
    one binary per GPU), so per-image latency is fixed by one chip's speed.

    Non-divisible shard sizes (e.g. the /32 pyramid level's 20 rows over 8
    chips) are handled by the partitioner's internal padding; any batch size
    works (SP shards H, not batch).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ayolov2_tpu.export.exporter import make_serving_fn

    dtype = image_dtype if image_dtype is not None else jnp.bfloat16
    core = make_serving_fn(
        model, None,
        conf_thres=conf_thres, iou_thres=iou_thres, top_k=top_k,
        keep_top_k=keep_top_k, nms_box=nms_box, include_nms=True,
        image_dtype=dtype, fused_decode=img_hw is not None, img_hw=img_hw,
    )
    rep = replicate(mesh)
    v_sharded = jax.device_put(variables, rep)
    spatial = NamedSharding(mesh, P(None, axis, None, None))
    sharded = jax.jit(core, in_shardings=(rep, spatial), out_shardings=(rep, rep))

    def serve(images):
        assert images.ndim == 4, "expected NHWC uint8 images"
        return sharded(v_sharded, images)

    # exposed for compiled-structure assertions: tests grep the compiled HLO
    # for collective-permute (halo exchange) and per-partition conv shapes —
    # numeric parity alone cannot distinguish true spatial partitioning from
    # a partitioner regression that all-gathers and computes replicated
    serve.jitted = sharded
    serve.variables = v_sharded
    return serve

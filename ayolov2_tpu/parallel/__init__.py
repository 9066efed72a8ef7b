"""Distributed layer: device mesh, sharding specs, collectives-by-construction.

The reference's DDP/DP/SyncBN stack (scripts/train/train_model_builder.py:75-141,
SURVEY §2.4) maps to a single concept here: a 1-D ``data`` mesh with pjit.
XLA inserts the gradient all-reduce (the DDP analogue) automatically; BatchNorm
statistics are computed over the *global* sharded batch inside the jitted
train step, which IS SyncBatchNorm — no wrapper needed. Per-host input
sharding replaces DistributedSampler (ayolov2_tpu.data.loader shard=).
"""

from ayolov2_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    host_broadcast_max,
    initialize_distributed,
    is_main_process,
    make_global_batch,
    replicate,
    tp_sharding,
    shard_batch,
    zero_sharding,
)
from ayolov2_tpu.parallel.serve import (
    make_latency_serving_fn,
    make_sharded_serving_fn,
    serve_stream,
)

__all__ = [
    "make_sharded_serving_fn",
    "make_latency_serving_fn",
    "serve_stream",
    "zero_sharding",
    "tp_sharding",
    "get_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "initialize_distributed",
    "is_main_process",
    "make_global_batch",
    "host_broadcast_max",
]

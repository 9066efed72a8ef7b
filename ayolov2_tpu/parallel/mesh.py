"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL process-group bootstrap
(train_model_builder.py:93-114 ddp_init): ``jax.distributed.initialize`` per
host (when multi-host), one global ``Mesh`` over all chips, NamedSharding
specs for batch-sharded arrays and replicated pytrees.

The model family is a CNN detector: data parallelism is the only required
axis (SURVEY §2.4 — TP/PP/SP/EP deliberately absent upstream). The mesh is
built 1-D ``('data',)`` by default but accepts extra trailing axes so future
model-parallel experiments can reuse the same helpers.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host bootstrap (no-op single-host). Parity: ddp_init."""
    if int(os.environ.get("AYOLO_NUM_HOSTS", "1")) > 1 and jax.process_count() == 1:
        jax.distributed.initialize()


def get_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over all (or given) devices. 1-D data mesh by default."""
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Sharding that splits dim 0 across the data axis, replicates the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, EMA, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """device_put a host batch with dim-0 sharded across the mesh."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(put, tree)

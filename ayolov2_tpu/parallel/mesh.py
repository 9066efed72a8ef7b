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
    """Multi-host bootstrap (no-op single-host). Parity: ddp_init
    (train_model_builder.py:93-114) — the reference's LOCAL_RANK/RANK/
    WORLD_SIZE env contract becomes AYOLO_COORDINATOR / AYOLO_NUM_PROCS /
    AYOLO_PROC_ID (explicit cluster, e.g. CPU/GPU pods or tests) or plain
    ``jax.distributed.initialize()`` auto-detection (TPU pods) when only
    AYOLO_NUM_HOSTS>1 is set.
    """
    # NOTE: do not probe jax.process_count() here — it would initialize the
    # XLA backend, after which jax.distributed.initialize refuses to run
    if jax.distributed.is_initialized():
        return
    n_procs = int(os.environ.get("AYOLO_NUM_PROCS", "0"))
    if n_procs > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ.get("AYOLO_COORDINATOR", "localhost:12321"),
            num_processes=n_procs,
            process_id=int(os.environ.get("AYOLO_PROC_ID", "0")),
        )
    elif int(os.environ.get("AYOLO_NUM_HOSTS", "1")) > 1:
        jax.distributed.initialize()


def is_main_process() -> bool:
    """Host-0 gate for checkpoint/val/logging (torch_utils.py:38-49 /
    yolo_trainer.py:394 rank-0 semantics)."""
    return jax.process_index() == 0


def host_broadcast_max(mesh: Mesh, value: float) -> float:
    """All-hosts max of a scalar — the mesh-era replacement for the
    reference's ``dist.broadcast`` of rank-0 decisions (yolo_trainer.py:458-467,
    torch_utils.py:38-49 barrier): every host contributes (host 0 the real
    value, others a neutral 0), one tiny jitted all-reduce returns the same
    number everywhere. No-op single-process."""
    if jax.process_count() == 1:
        return value
    import jax.numpy as jnp

    local = np.full((jax.local_device_count(),), value, np.float32)
    g = jax.make_array_from_process_local_data(batch_sharding(mesh, 1), local)
    out = jax.jit(
        jnp.max, in_shardings=batch_sharding(mesh, 1), out_shardings=replicate(mesh)
    )(g)
    return float(out)


def make_global_batch(mesh: Mesh, images: Any, targets: Any, target_mask: Any) -> Tuple[Any, Any, Any]:
    """Assemble per-host loader shards into global device arrays.

    Single-process: passthrough (jit's in_shardings handle placement).
    Multi-process: each host holds batch/world_size items
    (DataLoader(shard=(process_index, process_count))); images/targets/mask
    become dim-0-sharded global arrays via
    ``jax.make_array_from_process_local_data``, and the targets' image-index
    column is offset to GLOBAL batch rows (the reference's per-rank batch
    split + DistributedSampler contract, data_loader_utils.py:67,101-103).
    """
    if jax.process_count() == 1:
        return images, targets, target_mask
    images = np.asarray(images)
    targets = np.array(targets, copy=True)
    local_bs = images.shape[0]
    targets[:, 0] += jax.process_index() * local_bs
    gi = jax.make_array_from_process_local_data(batch_sharding(mesh, images.ndim), images)
    gt = jax.make_array_from_process_local_data(batch_sharding(mesh, targets.ndim), targets)
    gm = jax.make_array_from_process_local_data(batch_sharding(mesh, 1), np.asarray(target_mask))
    return gi, gt, gm


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


def zero_sharding(mesh: Mesh, tree: Any, axis: str = "data", min_elems: int = 65536) -> Any:
    """ZeRO-style sharding-spec tree for a train state (beyond-reference).

    The reference replicates model + optimizer state on every GPU (plain DDP,
    train_model_builder.py:93-114); on a TPU mesh the same memory instead
    amortizes across chips: every leaf with >= ``min_elems`` elements is
    sharded over ``axis`` along its largest evenly-divisible dim, everything
    else (biases, BN vectors, scalars) stays replicated. Handing the result
    to ``jit`` as the state's in/out sharding makes XLA's SPMD partitioner
    all-gather weights at their use sites and keep the optimizer/EMA update
    fully sharded — the ZeRO-3 recipe, expressed as layout annotations
    instead of hand-written collectives. Per-chip state memory drops ~N-fold
    for the large conv kernels (params + momentum + EMA), buying batch/remat
    headroom for yolov5x-scale training.

    Returns a pytree of NamedSharding congruent with ``tree``.
    """
    n = int(mesh.shape[axis])
    rep = NamedSharding(mesh, P())

    def spec(x):
        shape = tuple(getattr(x, "shape", ()) or ())
        if n <= 1 or not shape or int(np.prod(shape)) < min_elems:
            return rep
        cands = [d for d, s in enumerate(shape) if s % n == 0 and s >= n]
        if not cands:
            return rep
        d = max(cands, key=lambda i: shape[i])
        parts: list = [None] * len(shape)
        parts[d] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec, tree)


def tp_sharding(mesh: Mesh, tree: Any, axis: str = "model") -> Any:
    """Tensor-parallel sharding-spec tree over a 2-D (data, model) mesh
    (beyond-reference).

    Where :func:`zero_sharding` shards *storage* and gathers full weights at
    use sites, TP shards the *computation*: every conv kernel is split on
    its output-channel dim over ``axis`` (HWIO dim 3; Linear dim 1; channel
    vectors — bias, BN scale/bias/mean/var and their EMA/momenta — dim 0),
    and the train step constrains conv activations to the matching
    ``P(data, None, None, model)`` layout (layers.tp_scope), so XLA's SPMD
    partitioner keeps each chip computing only its channel slice and
    inserts the cross-channel collectives (all-reduce on the next conv's
    cin contraction) over ICI. Channel counts not divisible by the axis
    size (e.g. the 255-wide detection head convs) stay replicated.

    The shard dim is keyed on the LEAF NAME, not bare rank (ADVICE r4 #4):
    optimizer/EMA leaves mirror the param tree so their trailing path key is
    the same ``kernel``/``bias``/``scale``/``mean``/``var`` name; any leaf
    whose name or rank falls outside this table is replicated (safe) rather
    than silently sharded on a dim that may not be output-channel-major.

    Returns a pytree of NamedSharding congruent with ``tree``.
    """
    n = int(mesh.shape[axis])
    rep = NamedSharding(mesh, P())
    # leaf-name -> {ndim: output-channel dim}: conv kernels are HWIO (dim 3),
    # Linear kernels (in, out) (dim 1), channel vectors dim 0
    dim_by_name = {
        "kernel": {4: 3, 2: 1},
        "q_kernel": {4: 3, 2: 1},
        "bias": {1: 0},
        "scale": {1: 0},
        "mean": {1: 0},
        "var": {1: 0},
        "w_scale": {1: 0},
    }

    def _leaf_name(path) -> str:
        for entry in reversed(path):
            key = getattr(entry, "key", None)
            if key is None:
                key = getattr(entry, "name", None)
            if isinstance(key, str):
                return key
        return ""

    def spec(path, x):
        shape = tuple(getattr(x, "shape", ()) or ())
        if n <= 1 or not shape:
            return rep
        d = dim_by_name.get(_leaf_name(path), {}).get(len(shape))
        if d is None or shape[d] % n != 0 or shape[d] < n:
            return rep
        parts: list = [None] * len(shape)
        parts[d] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """device_put a host batch with dim-0 sharded across the mesh."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(put, tree)

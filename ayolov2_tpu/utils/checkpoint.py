"""Single-file msgpack checkpoints with the reference's ckpt semantics.

Parity target (scripts/train/yolo_trainer.py:374-390 ``_save_weights``,
scripts/utils/torch_utils.py:182-264 loaders):
  - payload = {epoch, best_score, model (half), ema (half), optimizer state,
    ema updates, [mAP50]}
  - loaders prefer the ``ema`` branch over ``model`` (torch_utils.py:241-252)
  - weight transfer across differing configs via shape-matched intersection
    (``intersect_dicts``, torch_utils.py:147-158)

TPU-first: the "model" is a pytree of fp32 params + batch_stats; half
storage uses bfloat16 (the TPU-native 16-bit float, same exponent range as
fp32 so no GradScaler round-trip issues). Serialization is flax msgpack —
one portable file per checkpoint (last/best/epoch_N file naming preserved).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

CKPT_VERSION = 1


def _cast_tree(tree: Any, dtype) -> Any:
    def cast(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating) or x.dtype == jnp.bfloat16:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def save_checkpoint(
    path: Union[str, Path],
    state,
    epoch: int,
    best_score: float = 0.0,
    map50: Optional[float] = None,
    model_cfg: Optional[Dict[str, Any]] = None,
    half: bool = True,
    include_optimizer: bool = True,
) -> None:
    """Write one checkpoint file.

    Args:
        state: TrainState (or any pytree with params/batch_stats/ema_* and
            opt_state attributes).
        epoch: last completed epoch (resume starts at epoch+1).
        best_score: best validation score so far.
        map50: this checkpoint's mAP50 (stored for SWA ranking,
            yolo_trainer.py:386-389).
        model_cfg: the parsed model YAML dict — stored so val/export can
            rebuild the graph without the original file.
        half: store float trees as bfloat16.
        include_optimizer: drop optimizer state for final/best artifacts.
    """
    fdtype = np.dtype(jnp.bfloat16) if half else np.float32
    payload: Dict[str, Any] = {
        "meta": {
            "version": CKPT_VERSION,
            "epoch": int(epoch),
            "best_score": float(best_score),
            "map50": -1.0 if map50 is None else float(map50),
            "model_cfg": json.dumps(model_cfg) if model_cfg else "",
            "ema_updates": int(np.asarray(state.ema_updates)) if hasattr(state, "ema_updates") else 0,
            "step": int(np.asarray(state.step)) if hasattr(state, "step") else 0,
        },
        "model": {
            "params": _cast_tree(jax.device_get(state.params), fdtype),
            "batch_stats": _cast_tree(jax.device_get(state.batch_stats), np.float32),
        },
        "ema": {
            "params": _cast_tree(jax.device_get(state.ema_params), fdtype),
            "batch_stats": _cast_tree(jax.device_get(state.ema_batch_stats), np.float32),
        },
    }
    if include_optimizer:
        payload["optimizer"] = serialization.to_state_dict(jax.device_get(state.opt_state))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic publish: last.ckpt is overwritten every validation AND on the
    # SIGTERM preemption path — a crash mid-write must never corrupt the
    # only resumable artifact. Write-to-tmp + rename is atomic on POSIX.
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


class AsyncCheckpointWriter:
    """Serialize+write checkpoints off the training thread.

    TPU-native analogue of orbax's async checkpointing (SURVEY §5 "orbax-style
    pytree checkpoints"): jax arrays are immutable, so handing the live state
    pytree to a worker thread is a consistent zero-copy snapshot — the train
    loop rebinds ``self.state`` to NEW arrays on the next step while the
    worker device_gets and writes the old ones. The device transfer, the
    bf16 cast, msgpack serialization, and the disk write (seconds for
    yolov5x-scale state through a tunneled backend) all leave the step loop.

    One worker thread + a queue: saves of the same file (last.ckpt every
    validation) stay ordered. Cost: the snapshot keeps the previous state's
    device buffers alive until written — budget one extra state copy of HBM
    when enabling (``train.async_ckpt``).

    The reference has nothing comparable — its ``torch.save`` blocks the
    loop (scripts/train/yolo_trainer.py:374-390).
    """

    def __init__(self) -> None:
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True, name="ckpt-writer")
        self._thread.start()

    def _run(self) -> None:
        while True:
            job = self._q.get()
            if job is None:
                return
            try:
                job()
            except BaseException as e:  # surfaced on the next wait()/submit()
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn) -> None:
        """Enqueue a zero-arg save callable; raises any prior write error."""
        self._raise_pending()
        self._q.put(fn)

    def wait(self) -> None:
        """Block until every queued save hit disk; re-raise worker errors."""
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        """Drain, then stop the worker thread."""
        self.wait()
        self._q.put(None)
        self._thread.join(timeout=60)

    def _raise_pending(self) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err


def load_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    """Read a checkpoint file back into plain nested dicts."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    return raw


def load_torch_variables(
    path: Union[str, Path], model_cfg: Union[str, Dict[str, Any]], prefer_ema: bool = True,
    nc: Optional[int] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ``.pt`` checkpoint -> (unfused fp32 variables, meta).

    The reference CLIs take ``.pt`` weights directly (val.py:241-278,
    train.py accepts ``--model yolov5l_kindle.pt`` in the SWA workflow,
    README.md:380-385); this gives every CLI here the same capability. The
    torch state_dict is name/shape-mapped into a template built from
    ``model_cfg`` (required — a torch pickle carries no kindle YAML we can
    trust), so the returned tree is a drop-in for :func:`load_variables`.
    """
    import jax as _jax  # local: keep module import light for non-jax users

    from ayolov2_tpu.models import build_model, init_model
    from ayolov2_tpu.models.builder import parse_model_config
    from ayolov2_tpu.utils.torch_import import (
        load_torch_checkpoint,
        torch_state_dict_to_pytree,
    )

    if not model_cfg:
        # explicit error (not assert: survives ``python -O``) — a torch
        # pickle carries no kindle YAML we can trust, so the graph template
        # must come from the caller
        raise ValueError(f"loading {path}: reference .pt weights need --model-cfg")
    cfg = parse_model_config(model_cfg)
    # nc overrides the YAML's class count so e.g. a VOC-trained .pt maps its
    # head convs into a matching template instead of warning them away
    template = build_model(cfg, dtype=jnp.float32, nc=nc)
    variables = init_model(template, _jax.random.PRNGKey(0), img_size=64)
    sd = load_torch_checkpoint(str(path), prefer_ema=prefer_ema)
    params, stats, n_matched, unmatched = torch_state_dict_to_pytree(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    if unmatched:
        from ayolov2_tpu.utils.logger import get_logger

        get_logger(__name__).warning(
            "torch import %s: %d matched, %d unmatched (first: %s)",
            path, n_matched, len(unmatched), unmatched[:5],
        )
    # store the EFFECTIVE class count: a consumer that rebuilds the graph
    # from the embedded cfg (e.g. export.py) must get head shapes matching
    # the imported params even when nc overrode the YAML's n_classes
    meta = {
        "model_cfg": json.dumps({**cfg, "n_classes": int(template.nc)}),
        "torch_import": str(path),
        "torch_matched": int(n_matched),
        "torch_unmatched": len(unmatched),
    }
    return {"params": params, "batch_stats": stats}, meta


def load_variables(
    path: Union[str, Path], prefer_ema: bool = True, dtype=np.float32,
    model_cfg: Union[str, Dict[str, Any], None] = None, nc: Optional[int] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Checkpoint -> ({'params', 'batch_stats'} fp32, meta dict).

    Prefers the EMA branch like the reference loaders (torch_utils.py:241-252).
    ``.pt`` paths are imported from the reference's torch format on the fly
    (``model_cfg`` required for those; see :func:`load_torch_variables`).
    """
    if str(path).endswith(".pt"):
        variables, meta = load_torch_variables(path, model_cfg, prefer_ema=prefer_ema, nc=nc)
        variables["params"] = _cast_tree(variables["params"], dtype)
        return variables, meta
    raw = load_checkpoint(path)
    branch = raw.get("ema") if prefer_ema and raw.get("ema") else raw["model"]
    variables = {
        "params": _cast_tree(branch["params"], dtype),
        "batch_stats": _cast_tree(branch.get("batch_stats", {}), np.float32),
    }
    return variables, raw.get("meta", {})


def restore_train_state(path: Union[str, Path], template):
    """Full resume: checkpoint + a freshly built TrainState template -> state.

    Optimizer state is restored via flax ``from_state_dict`` against the
    template's structure; float trees are cast back to the template dtypes.
    """
    raw = load_checkpoint(path)
    meta = raw["meta"]

    def like(src, ref):
        return jax.tree_util.tree_map(lambda s, r: np.asarray(s, dtype=r.dtype).reshape(r.shape), src, ref)

    new = template.replace(
        params=like(raw["model"]["params"], template.params),
        batch_stats=like(raw["model"]["batch_stats"], template.batch_stats),
        ema_params=like(raw["ema"]["params"], template.ema_params),
        ema_batch_stats=like(raw["ema"]["batch_stats"], template.ema_batch_stats),
        ema_updates=jnp.asarray(meta["ema_updates"], jnp.int32),
        step=jnp.asarray(meta["step"], jnp.int32),
    )
    if "optimizer" in raw:
        new = new.replace(
            opt_state=serialization.from_state_dict(template.opt_state, raw["optimizer"])
        )
    return new, meta


def intersect_trees(src: Dict[str, Any], dst: Dict[str, Any]) -> Tuple[Dict[str, Any], int, int]:
    """Shape-matched weight transfer (torch_utils.py:147-158 intersect_dicts).

    Copies every leaf of ``src`` into a copy of ``dst`` where the path exists
    and shapes match. Returns (merged, n_matched, n_total_dst_leaves).
    """
    matched = 0

    def merge(s, d):
        nonlocal matched
        if isinstance(d, dict):
            return {k: merge(s.get(k) if isinstance(s, dict) else None, v) for k, v in d.items()}
        if s is not None and np.asarray(s).shape == np.asarray(d).shape:
            matched += 1
            return np.asarray(s, dtype=np.asarray(d).dtype)
        return d

    merged = merge(src, dst)
    total = len(jax.tree_util.tree_leaves(dst))
    return merged, matched, total

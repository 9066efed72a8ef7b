"""Import reference (torch/kindle) checkpoints into the TPU pytree format.

Parity target: the reference stores ``{model | ema: nn.Module-or-state_dict}``
checkpoints (scripts/train/yolo_trainer.py:374-390, loaders at
scripts/utils/torch_utils.py:182-264). This module maps the torch
state_dict naming onto our flax pytree so pretrained reference weights run
here without retraining (SURVEY §7 build-order step 4: weight import).

Name mapping (kindle/ultralytics convention -> ours):
  model.{i}.conv.weight            -> params model_{i}/conv/kernel  (OIHW->HWIO)
  model.{i}.bn.{weight,bias}       -> params model_{i}/bn/{scale,bias}
  model.{i}.bn.running_{mean,var}  -> batch_stats model_{i}/bn/{mean,var}
  model.{i}.cv1.* / m.{k}.*        -> model_{i}/cv1/* / m{k}/*
  model.{i}.{r}.* (Sequential rep) -> model_{i}_{r}/*
  head model.{i}.m.{k}.{weight,bias} -> model_{i}/m{k}/{kernel,bias}
  linear weight (2D)               -> kernel (transposed)

A reverse transform (:func:`pytree_to_torch_state_dict`) is provided for
round-trip testing and for migrating weights back out.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


def _torch_name_to_path(name: str) -> Tuple[Tuple[str, ...], str]:
    """'model.2.m.0.cv1.conv.weight' -> (('model_2', 'm0', 'cv1', 'conv'), 'weight')."""
    parts = name.split(".")
    out: List[str] = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) - 1 else None
        if p == "model" and nxt is not None and nxt.isdigit():
            idx = parts[i + 1]
            i += 2
            # sequential repeats: model.{i}.{r}.xxx -> model_{i}_{r}
            if i < len(parts) - 1 and parts[i].isdigit():
                out.append(f"model_{idx}_{parts[i]}")
                i += 1
            else:
                out.append(f"model_{idx}")
        elif p.isdigit():
            # bare numeric segment inside a Sequential: fold into previous name
            out[-1] = f"{out[-1]}_{p}"
            i += 1
        elif nxt is not None and nxt.isdigit() and p in ("m", "tr"):
            out.append(f"{p}{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out), parts[-1]


def _get(tree: Dict[str, Any], path: Tuple[str, ...]) -> Optional[Any]:
    for p in path:
        if not isinstance(tree, dict) or p not in tree:
            return None
        tree = tree[p]
    return tree


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: Any) -> bool:
    for p in path[:-1]:
        if not isinstance(tree, dict) or p not in tree:
            return False
        tree = tree[p]
    if not isinstance(tree, dict) or path[-1] not in tree:
        return False
    tree[path[-1]] = value
    return True


def torch_state_dict_to_pytree(
    state_dict: Dict[str, Any],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any], int, List[str]]:
    """Fill (copies of) the param/batch_stats templates from a torch state_dict.

    Returns (params, batch_stats, n_matched, unmatched_names). Leaves whose
    path or shape doesn't match stay at their template value (the
    ``intersect_dicts`` transfer semantics, torch_utils.py:147-158).
    """
    import copy

    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    n_matched = 0
    unmatched: List[str] = []

    for name, tensor in state_dict.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        path, leaf = _torch_name_to_path(name)

        candidates: List[Tuple[Dict[str, Any], Tuple[str, ...], np.ndarray]] = []
        if leaf == "weight":
            if t.ndim == 4:  # conv OIHW -> HWIO
                candidates.append((params, path + ("kernel",), t.transpose(2, 3, 1, 0)))
                # head convs: torch 'm.0.weight' with no trailing module name
                candidates.append((params, path[:-1] + (path[-1], "kernel"), t.transpose(2, 3, 1, 0)))
            elif t.ndim == 2:  # linear (O, I) -> (I, O)
                candidates.append((params, path + ("kernel",), t.T))
            elif t.ndim == 1:  # bn scale
                candidates.append((params, path + ("scale",), t))
        elif leaf == "bias":
            candidates.append((params, path + ("bias",), t))
        elif leaf == "running_mean":
            candidates.append((batch_stats, path + ("mean",), t))
        elif leaf == "running_var":
            candidates.append((batch_stats, path + ("var",), t))
        else:  # num_batches_tracked, anchors, anchor_grid buffers
            continue

        placed = False
        for tree, cand_path, value in candidates:
            current = _get(tree, cand_path)
            if current is not None and np.shape(current) == value.shape:
                _set(tree, cand_path, value.astype(np.asarray(current).dtype))
                n_matched += 1
                placed = True
                break
        if not placed:
            unmatched.append(name)

    if unmatched:
        LOGGER.warning("%d torch tensors had no matching pytree leaf (first: %s)",
                       len(unmatched), unmatched[:5])
    return params, batch_stats, n_matched, unmatched


def load_torch_checkpoint(path: str, prefer_ema: bool = True) -> Dict[str, Any]:
    """Read a reference .pt checkpoint into a flat name->array state_dict.

    Handles {epoch, model, ema, ...} dicts (preferring ``ema``,
    torch_utils.py:241-252), nn.Module values (via .state_dict()), and raw
    state_dicts. Unpickling module objects requires their classes to be
    importable; export a state_dict from the reference environment when the
    kindle package is unavailable here.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    obj = ckpt
    if isinstance(ckpt, dict) and ("ema" in ckpt or "model" in ckpt):
        obj = (ckpt.get("ema") if prefer_ema else None) or ckpt.get("model") or ckpt
    if hasattr(obj, "state_dict"):
        obj = obj.float().state_dict()
    assert isinstance(obj, dict), f"cannot interpret checkpoint {path}"
    return obj


def pytree_to_torch_state_dict(
    params: Dict[str, Any], batch_stats: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Inverse transform: our pytree -> torch-style state_dict names/layouts."""
    out: Dict[str, np.ndarray] = {}

    def torch_name(path: Tuple[str, ...]) -> str:
        parts: List[str] = []
        for p in path:
            if p.startswith("model_"):
                bits = p.split("_")[1:]
                parts.append("model")
                parts.extend(bits)
            elif len(p) > 1 and p[0] in ("m",) and p[1:].isdigit():
                parts.extend([p[0], p[1:]])
            else:
                parts.append(p)
        return ".".join(parts)

    def walk(tree, path, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,), is_stats)
                continue
            arr = np.asarray(v)
            base = torch_name(path)
            if is_stats:
                leaf = {"mean": "running_mean", "var": "running_var"}[k]
                out[f"{base}.{leaf}"] = arr
            elif k == "kernel":
                if arr.ndim == 4:
                    out[f"{base}.weight"] = arr.transpose(3, 2, 0, 1)
                else:
                    out[f"{base}.weight"] = arr.T
            elif k == "scale":
                out[f"{base}.weight"] = arr
            else:
                out[f"{base}.{k}"] = arr

    walk(params, (), False)
    walk(batch_stats, (), True)
    return out

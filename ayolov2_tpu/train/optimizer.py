"""Optimizer with YOLOv5's 3 parameter groups + warmup schedules (optax).

Parity target: scripts/train/yolo_trainer.py:139-221:
  - group 0: BatchNorm scales — no weight decay
  - group 1: conv/dense kernels — weight decay
  - group 2: biases — no decay, higher warmup lr (warmup_bias_lr)
  - SGD(momentum, nesterov) or Adam
  - per-iteration warmup: lr ramps 0 (bias: warmup_bias_lr) -> lr0*lf(epoch)
    over nw = max(3 epochs, 1000 iters); momentum ramps warmup_momentum ->
    momentum (np.interp semantics = linear)
  - cosine or linear epoch schedule lf(e) (yolo_trainer.py:124-137)

Weight decay is scaled by accumulated batch size as in the reference:
decay *= batch_size * accumulate / nbs (yolo_trainer.py:150-152).

TPU note: schedules are pure functions of the integer step carried in the
optimizer state, so the whole update is one fused jitted graph — no host
control of lr per step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

NBS_NOMINAL = 64  # nominal batch size (yolo_trainer.py:149)


def lr_schedule(
    epochs: int,
    lrf: float,
    linear: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-epoch lr multiplier lf(e) — cosine (default) or linear."""

    def lf(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        if linear:
            return (1.0 - e / epochs) * (1.0 - lrf) + lrf
        return ((1.0 + jnp.cos(e * math.pi / epochs)) / 2.0) * (1.0 - lrf) + lrf

    return lf


def _interp(x, x0, x1, y0, y1):
    """np.interp for a single segment, clamped (the reference ramps)."""
    t = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
    return y0 + t * (y1 - y0)


def make_group_schedules(
    lr0: float,
    lrf: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: float = 3.0,
    warmup_bias_lr: float = 0.1,
    warmup_momentum: float = 0.8,
    momentum: float = 0.937,
    linear_lr: bool = False,
    warmup_min_iters: int = 1000,
):
    """Build (lr_fn(step, group), momentum_fn(step)) closures.

    ``warmup_min_iters``: the reference floors warmup at 1000 iterations
    (yolo_trainer.py:207); lower it for tiny smoke datasets where 1000
    steps would span the whole run.
    """
    lf = lr_schedule(epochs, lrf, linear_lr)
    nw = max(int(round(warmup_epochs * steps_per_epoch)), warmup_min_iters)

    def lr_fn(step: jnp.ndarray, group: str) -> jnp.ndarray:
        epoch = jnp.floor(step / steps_per_epoch)
        base = lr0 * lf(epoch)
        start = warmup_bias_lr if group == "bias" else 0.0
        warm = _interp(step, 0, nw, start, base)
        return jnp.where(step < nw, warm, base)

    def mom_fn(step: jnp.ndarray) -> jnp.ndarray:
        warm = _interp(step, 0, nw, warmup_momentum, momentum)
        return jnp.where(step < nw, warm, momentum)

    return lr_fn, mom_fn


def _param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label each leaf: bn_scale | bias | weight (the 3 reference groups)."""

    def walk(tree, in_bn):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, in_bn or k == "bn" or k.startswith("ln"))
            else:
                if in_bn:
                    out[k] = "bn_scale"  # BN/LN scale AND bias: no decay group
                elif k in ("bias",):
                    out[k] = "bias"
                else:
                    out[k] = "weight"
        return out

    return walk(params, False)


def _sgd_with_schedules(lr_fn, mom_fn, group: str, weight_decay: float, nesterov: bool = True):
    """SGD whose lr and momentum are functions of the step counter."""

    def init(params):
        return {
            "momentum": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params):
        step = state["step"]
        lr = lr_fn(step.astype(jnp.float32), group)
        mom = mom_fn(step.astype(jnp.float32))

        if weight_decay:
            grads = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p, grads, params)

        new_buf = jax.tree_util.tree_map(lambda b, g: b * mom + g, state["momentum"], grads)
        if nesterov:
            upd = jax.tree_util.tree_map(lambda b, g: -(lr) * (g + mom * b), new_buf, grads)
        else:
            upd = jax.tree_util.tree_map(lambda b: -(lr) * b, new_buf)
        return upd, {"momentum": new_buf, "step": step + 1}

    return optax.GradientTransformation(init, update)


def _adam_with_schedules(lr_fn, group: str, weight_decay: float, b1: float = 0.937, b2: float = 0.999):
    def init(params):
        return {
            "adam": optax.scale_by_adam(b1=b1, b2=b2).init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    inner = optax.scale_by_adam(b1=b1, b2=b2)

    def update(grads, state, params):
        step = state["step"]
        lr = lr_fn(step.astype(jnp.float32), group)
        if weight_decay:
            grads = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p, grads, params)
        upd, adam_state = inner.update(grads, state["adam"], params)
        upd = jax.tree_util.tree_map(lambda u: -lr * u, upd)
        return upd, {"adam": adam_state, "step": step + 1}

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params: Dict[str, Any],
    hyp: Dict[str, Any],
    epochs: int,
    steps_per_epoch: int,
    batch_size: int,
    accumulate: int = 1,
    optimizer: str = "SGD",
    linear_lr: bool = False,
) -> optax.GradientTransformation:
    """Build the 3-group optimizer from the hyper_params config section.

    ``steps_per_epoch`` is in MICRO-BATCH units (``len(train_loader)``).
    When ``accumulate > 1`` the whole transformation is wrapped in
    optax.MultiSteps, whose inner step counter ticks once per ``accumulate``
    micro-batches — so the schedules are converted here to optimizer-update
    units (divide by ``accumulate``). This matches the reference's ramp,
    which counts micro-iterations ni with nw = max(3·nb, 1000)
    (yolo_trainer.py:205-221), expressed in update units.
    """
    opt_params = hyp.get("optimizer_params", {})
    lr0 = float(opt_params.get("lr", 0.01))
    momentum = float(opt_params.get("momentum", hyp.get("momentum", 0.937)))
    nesterov = bool(opt_params.get("nesterov", True))
    weight_decay = float(hyp.get("weight_decay", 5e-4))
    # decay scaling (yolo_trainer.py:150-152)
    weight_decay *= batch_size * accumulate / NBS_NOMINAL

    lr_fn, mom_fn = make_group_schedules(
        lr0=lr0,
        lrf=float(hyp.get("lrf", 0.1)),
        epochs=epochs,
        steps_per_epoch=max(steps_per_epoch // accumulate, 1),
        warmup_epochs=float(hyp.get("warmup_epochs", 3.0)),
        warmup_bias_lr=float(hyp.get("warmup_bias_lr", 0.1)),
        warmup_momentum=float(hyp.get("warmup_momentum", 0.8)),
        momentum=momentum,
        linear_lr=linear_lr,
        warmup_min_iters=max(int(hyp.get("warmup_min_iters", 1000)) // accumulate, 1),
    )

    def make(group: str, wd: float):
        if optimizer.lower() == "adam":
            betas = opt_params.get("betas", [0.937, 0.999])
            return _adam_with_schedules(lr_fn, group, wd, b1=betas[0], b2=betas[1])
        return _sgd_with_schedules(lr_fn, mom_fn, group, wd, nesterov)

    tx = optax.multi_transform(
        {
            "bn_scale": make("bn_scale", 0.0),
            "weight": make("weight", weight_decay),
            "bias": make("bias", 0.0),
        },
        _param_labels(params),
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx

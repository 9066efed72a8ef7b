"""Train state, EMA, and the jitted/pjit-able train step.

Parity targets:
  - EMA decay d(x) = decay * (1 - e^{-x/2000}) over params AND BN stats
    (scripts/utils/torch_utils.py:377-426 ModelEMA — its state_dict covers
    running stats too).
  - training_step semantics (scripts/train/yolo_trainer.py:289-358): uint8
    image -> float/255, forward, ComputeLoss, backward, optimizer step, EMA.

TPU-first design:
  - One pure function = forward + loss + grad + update + EMA, jitted once
    under a Mesh; batch dim sharded over 'data', state replicated. XLA
    inserts the gradient all-reduce (DDP analogue) and computes BatchNorm
    stats over the *global* batch (SyncBN analogue) automatically.
  - bf16 compute / fp32 params; no GradScaler needed (bf16 has fp32 range —
    the AMP GradScaler machinery of the reference is torch/fp16-specific).
  - /255 normalization happens on device right after the uint8 H2D copy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ayolov2_tpu.loss.yolo_loss import ComputeLoss


class TrainState(struct.PyTreeNode):
    """Replicated training state (a pytree; safe under jit/pjit)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jnp.ndarray  # int32 EMA update counter
    step: jnp.ndarray  # int32 global step


@dataclasses.dataclass(frozen=True)
class EMA:
    """Exponential moving average config (torch_utils.py:377-426)."""

    decay: float = 0.9999
    tau: float = 2000.0

    def rate(self, updates: jnp.ndarray) -> jnp.ndarray:
        return self.decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / self.tau))

    def update(self, ema_tree: Any, new_tree: Any, updates: jnp.ndarray) -> Any:
        d = self.rate(updates)
        return jax.tree_util.tree_map(lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema_tree, new_tree)


def create_train_state(variables: Dict[str, Any], tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(lambda x: x, params),
        ema_batch_stats=jax.tree_util.tree_map(lambda x: x, batch_stats),
        ema_updates=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model,
    loss_fn: ComputeLoss,
    tx: optax.GradientTransformation,
    ema: EMA = EMA(),
    image_dtype: Any = jnp.bfloat16,
    tp: Any = None,
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array], Tuple[TrainState, jax.Array]]:
    """Build the pure train-step function.

    step(state, images_uint8 (B, H, W, 3), targets (M, 6), target_mask (M,))
      -> (new_state, loss_items [lbox, lobj, lcls, total])

    Jit it with batch args sharded over the mesh's 'data' axis and the state
    replicated; XLA handles cross-device reduction.

    ``tp``: a 2-D (data, model) Mesh for tensor-parallel training — conv
    activations are constrained to P(data, None, None, model) while tracing
    (models.layers.tp_scope), pairing with parallel.mesh.tp_sharding state
    shardings so each chip computes only its channel slice.
    """
    import contextlib

    from ayolov2_tpu.models import layers as L

    def step_fn(state: TrainState, images: jax.Array, targets: jax.Array, target_mask: jax.Array):
        imgs = images.astype(image_dtype) / jnp.asarray(255.0, image_dtype)

        def compute(params):
            with (L.tp_scope(tp) if tp is not None else contextlib.nullcontext()):
                raw, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs,
                    training=True,
                    mutable=["batch_stats"],
                )
            total, items = loss_fn(raw, targets, target_mask)
            return total, (mutated["batch_stats"], items)

        (loss, (new_stats, items)), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema_updates = state.ema_updates + 1
        new_ema_params = ema.update(state.ema_params, new_params, new_ema_updates)
        new_ema_stats = ema.update(state.ema_batch_stats, new_stats, new_ema_updates)

        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema_params,
            ema_batch_stats=new_ema_stats,
            ema_updates=new_ema_updates,
            step=state.step + 1,
        )
        return new_state, items

    return step_fn


def make_eval_step(model, image_dtype: Any = jnp.bfloat16, use_ema: bool = True):
    """Pure eval forward: uint8 batch -> decoded predictions (fp32)."""

    def eval_fn(state: TrainState, images: jax.Array):
        imgs = images.astype(image_dtype) / jnp.asarray(255.0, image_dtype)
        variables = {
            "params": state.ema_params if use_ema else state.params,
            "batch_stats": state.ema_batch_stats if use_ema else state.batch_stats,
        }
        decoded, _ = model.apply(variables, imgs, training=False)
        return decoded.astype(jnp.float32)

    return eval_fn

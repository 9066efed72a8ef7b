"""Pallas TPU kernel for greedy NMS suppression.

The greedy keep-mask scan is the one inherently sequential piece of the
serving path (reference semantics: torchvision.ops.nms keep-sets — row i
suppresses lower-scored j only if i itself survived). The XLA fori_loop
version (ops/nms.py:_greedy_suppress) pays per-iteration HLO loop overhead;
this kernel runs the whole scan on-core with the K x K IoU matrix resident
in VMEM (K=512 fp32 = 1 MB) and one VPU vector op per step.

vmap over the batch dimension maps to the Pallas grid automatically.
Numerically identical keep-sets to the XLA path (same masking algebra).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _greedy_kernel(iou_ref, valid_ref, keep_ref, *, iou_thres: float):
    """Blocked greedy scan: 128-wide chunks.

    Stage 1 (sequential, per chunk): resolve suppression *within* the chunk
    on (1, 128) vectors. Stage 2 (vectorized): the chunk's survivors
    suppress every later candidate with one (128, n) masked max. Identical
    keep-set to the row-by-row scan — a row only suppresses once its own
    fate is final, and chunk state always reflects all earlier chunks.
    """
    n = iou_ref.shape[0]
    C = 128  # lane width
    col_local = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    col_global = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    keep_ref[:, :] = valid_ref[:, :]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)

    def chunk_body(c, carry):
        base = pl.multiple_of(c * C, C)
        block = iou_ref[pl.ds(base, C), pl.ds(base, C)]  # (C, C) aligned load

        def inner(j, kc):
            # row j of the block via masked reduce (dynamic sublane loads
            # with unaligned indices don't lower on TPU)
            row = jnp.sum(jnp.where(row_ids == j, block, 0.0), axis=0, keepdims=True)
            kj = jnp.sum(jnp.where(col_local == j, kc, 0.0))
            sup = (row > iou_thres) & (col_local > j) & (kj > 0.0)
            return jnp.where(sup, 0.0, kc)

        kc = jax.lax.fori_loop(0, C, inner, keep_ref[0:1, pl.ds(base, C)])
        keep_ref[0:1, pl.ds(base, C)] = kc

        # chunk survivors suppress all later candidates in one shot
        rows = iou_ref[pl.ds(base, C), :]  # (C, n)
        mask = (rows > iou_thres) & (kc.reshape(C, 1) > 0.0)
        sup_any = jnp.max(jnp.where(mask, 1.0, 0.0), axis=0, keepdims=True)
        later = col_global >= base + C
        keep_ref[:, :] = jnp.where(later & (sup_any > 0.0), 0.0, keep_ref[:, :])
        return carry

    jax.lax.fori_loop(0, n // C, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def greedy_suppress_pallas(
    iou: jax.Array, valid: jax.Array, iou_thres: float, interpret: bool = False
) -> jax.Array:
    """Greedy NMS keep-mask. iou: (K, K) fp32; valid: (K,) bool -> (K,) bool.

    Drop-in replacement for ops/nms._greedy_suppress; identical keep-sets.
    ``interpret=True`` runs the kernel in interpreter mode (CPU testing).
    """
    k = iou.shape[0]
    keep = pl.pallas_call(
        functools.partial(_greedy_kernel, iou_thres=iou_thres),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iou.astype(jnp.float32), valid.astype(jnp.float32).reshape(1, k))
    return keep.reshape(k) > 0.0


def pallas_supported() -> bool:
    """Greedy-kernel availability: compiled Pallas needs a TPU backend."""
    return jax.default_backend() == "tpu"

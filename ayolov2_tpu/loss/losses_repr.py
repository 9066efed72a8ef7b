"""Representation-learning losses: SimpleRL L1 and SimCLR InfoNCE.

Parity target: /root/reference/scripts/loss/losses_repr.py:
  - RLLoss (:14-46): L1 between interleaved even/odd view features,
    returned as (loss * bs, [loss], shape)
  - InfoNCELoss (:49-136): SimCLR NT-Xent — normalized feature similarity
    matrix, positives = other views of the same image, cross-entropy with
    the positives as class 0 (van den Oord et al., arXiv:1807.03748).

TPU-first: static-shape mask algebra (no boolean gathers) so both losses
jit into the train step.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RLLoss:
    """SimpleRL: mean L1 distance between the two views of each image.

    ``pred`` layout: interleaved views (img0_v0, img0_v1, img1_v0, ...) —
    the reference stacks even indices vs odd indices (losses_repr.py:38-40).
    """

    def __call__(self, pred: jax.Array) -> Tuple[jax.Array, jax.Array]:
        p1 = pred[0::2]
        p2 = pred[1::2]
        loss = jnp.abs(p1 - p2).sum() / p1.size
        return loss * p1.shape[0], jnp.asarray([loss])


@dataclasses.dataclass(frozen=True)
class InfoNCELoss:
    """SimCLR NT-Xent over n_trans views per image.

    ``features``: (n_trans * bs, d) with view-major layout — the reference
    builds labels as cat([arange(bs)] * n_trans) (losses_repr.py:92-99), so
    row i belongs to image i % bs.
    """

    batch_size: int = 32
    n_trans: int = 2
    temperature: float = 0.07

    def __call__(self, features: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n = features.shape[0]
        bs = n // self.n_trans
        img_ids = jnp.tile(jnp.arange(bs), self.n_trans)  # (n,)
        pos_mask = (img_ids[:, None] == img_ids[None, :]) & ~jnp.eye(n, dtype=bool)

        f = features / (jnp.linalg.norm(features, axis=1, keepdims=True) + 1e-12)
        sim = f @ f.T / self.temperature

        # reference semantics (losses_repr.py:120-132): each (row, positive)
        # pair is one CE example with logits [positive | negatives] and
        # target 0: loss = -log exp(pos) / (exp(pos) + sum exp(negatives))
        neg_inf = jnp.asarray(-1e9, sim.dtype)
        n_pos = self.n_trans - 1
        neg_mask = ~pos_mask & ~jnp.eye(n, dtype=bool)
        neg_logsum = jax.nn.logsumexp(jnp.where(neg_mask, sim, neg_inf), axis=1)
        per_pos = jnp.where(
            pos_mask,
            sim - jnp.logaddexp(sim, neg_logsum[:, None]),
            0.0,
        )
        loss = -jnp.sum(per_pos) / (n * n_pos)
        return loss * bs, jnp.asarray([loss])

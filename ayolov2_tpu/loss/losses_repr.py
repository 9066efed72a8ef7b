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

    ``features``: (bs * n_trans, d) with IMAGE-MAJOR layout — the reference
    builds labels as cat([[i]*n_trans for i in range(bs)]) i.e.
    repeat(arange(bs), n_trans) (losses_repr.py:92-99), so row i belongs to
    image i // n_trans.
    """

    batch_size: int = 32
    n_trans: int = 2
    temperature: float = 0.07

    def __call__(self, features: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n = features.shape[0]
        bs = n // self.n_trans
        img_ids = jnp.repeat(jnp.arange(bs), self.n_trans)  # (n,)
        eye = jnp.eye(n, dtype=bool)
        pos_mask = (img_ids[:, None] == img_ids[None, :]) & ~eye

        f = features / (jnp.linalg.norm(features, axis=1, keepdims=True) + 1e-12)
        sim = f @ f.T / self.temperature

        # Reference semantics (losses_repr.py:111-132): per row, ONE CE
        # example with logits [positives | negatives] and target 0 — the
        # numerator is the FIRST positive; the remaining positives sit in
        # the denominator alongside the negatives, so the denominator is
        # simply all off-diagonal entries of the row.
        neg_inf = jnp.asarray(-1e9, sim.dtype)
        denom = jax.nn.logsumexp(jnp.where(~eye, sim, neg_inf), axis=1)
        first_pos = jnp.argmax(pos_mask, axis=1)  # smallest j with same image
        pos_logit = jnp.take_along_axis(sim, first_pos[:, None], axis=1)[:, 0]
        loss = -(pos_logit - denom).mean()
        return loss * bs, jnp.asarray([loss])

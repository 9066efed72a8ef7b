"""YOLOv5 detection loss, re-formulated with static shapes for TPU.

Behavioral parity target: scripts/loss/losses.py:168-391 (ComputeLoss +
build_targets): CIoU box loss, BCE objectness with per-layer balance
[4.0, 1.0, 0.4], BCE classification with label smoothing, optional focal
terms, anchor-ratio matching (max(r, 1/r) < anchor_t) and 3-cell neighbor
offsets with bias g = 0.5.

TPU-first re-design (SURVEY.md §7 'build_targets parity'): the reference
produces variable-length index lists per level; XLA needs static shapes, so
every (offset o in 5, anchor a in na, target t in M) triple is a fixed slot
with a validity mask. Invalid slots contribute zero via masking and means are
computed as masked sums / counts — reproducing the exact reference loss
values (verified against an independent dynamic-shape oracle in
tests/test_loss.py). Scatter for the objectness target uses ``.max`` (the
reference's last-write-wins on duplicate cells is order-undefined; max is the
deterministic choice and equals it whenever duplicates carry equal IoU).

Everything here is pure jnp under jit: gathers, one scatter-max, elementwise
math — no host sync, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.utils.boxes import bbox_iou

# neighbor-cell offset table (losses.py:337-350), bias g = 0.5
_OFF = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float32) * 0.5


def smooth_bce(eps: float = 0.0) -> Tuple[float, float]:
    """Positive/negative BCE targets for label smoothing (losses.py:16)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def _bce_with_logits(logits: jax.Array, targets: jax.Array, pos_weight: float = 1.0) -> jax.Array:
    """Elementwise binary cross-entropy on logits with positive weighting."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def _focal_scale(logits: jax.Array, targets: jax.Array, gamma: float, alpha: float = 0.25) -> jax.Array:
    """Focal-loss modulation factor (losses.py:64-115 FocalLoss semantics)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_t * (1.0 - p_t) ** gamma


def _qfocal_scale(logits: jax.Array, targets: jax.Array, gamma: float, alpha: float = 0.25) -> jax.Array:
    """Quality-focal modulation (losses.py:118-165 QFocalLoss; arXiv:2006.04388):
    |target - sigmoid(pred)|^gamma with the same alpha weighting."""
    p = jax.nn.sigmoid(logits)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_t * jnp.abs(targets - p) ** gamma


def _bce_blur_scale(logits: jax.Array, targets: jax.Array, blur_alpha: float = 0.05) -> jax.Array:
    """BCEBlurWithLogitsLoss modulation (losses.py:30-61): down-weight
    'missing label' cases where pred >> target."""
    p = jax.nn.sigmoid(logits)
    dx = p - targets
    return 1.0 - jnp.exp((dx - 1.0) / (blur_alpha + 1e-4))


def pad_targets(labels: Sequence[np.ndarray], batch_size: int, max_targets: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: list of per-image (n_i, 5) [cls, xywh-normalized] label arrays
    -> fixed (M, 6) [img, cls, xywh] + (M,) valid mask, M = max_targets.
    The analogue of the reference collate_fn's batch-index column
    (data_loader.py:887-909), padded to capacity.
    """
    out = np.zeros((max_targets, 6), dtype=np.float32)
    mask = np.zeros((max_targets,), dtype=bool)
    k = 0
    for i, lab in enumerate(labels[:batch_size]):
        for row in np.asarray(lab, dtype=np.float32).reshape(-1, 5):
            if k >= max_targets:
                break
            out[k, 0] = i
            out[k, 1:] = row
            mask[k] = True
            k += 1
    return out, mask


@dataclasses.dataclass(frozen=True)
class ComputeLoss:
    """Static-shape YOLOv5 loss.

    Attributes mirror the reference hyp contract (train_config.yaml
    hyper_params): box/cls/obj gains, cls_pw/obj_pw, anchor_t, fl_gamma,
    label_smoothing. ``anchors`` are stride-normalized (nl, na, 2) — the
    head's loss-space anchors (yolo_head.stride_anchors()).
    """

    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]  # (nl, na, 2)
    nc: int
    hyp: Tuple[Tuple[str, float], ...]  # frozen dict of loss hyps
    autobalance: bool = False
    focal_type: str = "focal"  # "focal" (default) | "qfocal" (losses.py:118) | "bce_blur"

    @staticmethod
    def from_hyp(anchors: np.ndarray, nc: int, hyp: Dict[str, Any]) -> "ComputeLoss":
        keys = ("box", "cls", "obj", "cls_pw", "obj_pw", "anchor_t", "fl_gamma", "label_smoothing")
        frozen = tuple((k, float(hyp.get(k, {"cls_pw": 1.0, "obj_pw": 1.0, "anchor_t": 4.0}.get(k, 0.0)))) for k in keys)
        focal_type = str(hyp.get("focal_type", "focal"))
        a = tuple(tuple(tuple(float(v) for v in anc) for anc in level) for level in np.asarray(anchors))
        return ComputeLoss(anchors=a, nc=nc, hyp=frozen, focal_type=focal_type)

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0])

    @property
    def balance(self) -> Tuple[float, ...]:
        # per-layer objectness balance (losses.py:203-206)
        return (4.0, 1.0, 0.4) if self.nl == 3 else (4.0, 1.0, 0.25, 0.06, 0.02)

    def _h(self, key: str) -> float:
        return dict(self.hyp)[key]

    def _modulate(self, bce: jax.Array, logits: jax.Array, targets: jax.Array, gamma: float) -> jax.Array:
        """Apply the configured focal/blur modulation (FocalLoss / QFocalLoss /
        BCEBlurWithLogitsLoss parity, losses.py:30-165)."""
        if self.focal_type == "bce_blur":
            return bce * _bce_blur_scale(logits, targets)
        if gamma <= 0:
            return bce
        scale = _qfocal_scale if self.focal_type == "qfocal" else _focal_scale
        return bce * scale(logits, targets, gamma)

    def __call__(
        self,
        preds: List[jax.Array],
        targets: jax.Array,
        target_mask: jax.Array,
        image_weight: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Compute the loss.

        Args:
            preds: nl raw head maps (bs, ny, nx, na, 5+nc) — NHWC head layout.
            targets: (M, 6) [img_idx, cls, x, y, w, h] normalized, zero-padded.
            target_mask: (M,) validity of each row.
            image_weight: optional (bs,) 0/1 row validity — the objectness
                mean is taken over valid images only, so a padded final val
                batch reproduces the reference's short-last-batch loss
                exactly (train_utils.py:285-292 semantics; padded rows'
                targets must also be masked out of ``target_mask`` by the
                caller).

        Returns:
            (total_loss * bs, [lbox, lobj, lcls, total]) — the reference
            contract (losses.py:297-300).
        """
        hyp = dict(self.hyp)
        cp, cn = smooth_bce(hyp["label_smoothing"])
        gamma = hyp["fl_gamma"]
        anchors = jnp.asarray(self.anchors, dtype=jnp.float32)  # (nl, na, 2)
        na = self.na
        m_t = targets.shape[0]
        bs = preds[0].shape[0]

        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        lcls = jnp.zeros((), jnp.float32)

        for li, pred in enumerate(preds):
            pred = pred.astype(jnp.float32)
            ny, nx = pred.shape[1], pred.shape[2]
            gain = jnp.asarray([1.0, 1.0, nx, ny, nx, ny], jnp.float32)
            t = targets * gain  # grid-space (M, 6)

            # --- anchor-ratio match (losses.py:325-330) -------------------
            r = t[None, :, 4:6] / anchors[li][:, None, :]  # (na, M, 2)
            match = jnp.maximum(r, 1.0 / r).max(-1) < hyp["anchor_t"]  # (na, M)
            match = match & target_mask[None, :]

            # --- neighbor-cell offsets (losses.py:332-355) ----------------
            gxy = t[:, 2:4]  # (M, 2)
            gxi = gain[2:4] - gxy
            j_m = (jnp.mod(gxy, 1.0) < 0.5) & (gxy > 1.0)  # (M, 2) -> j, k
            l_m = (jnp.mod(gxi, 1.0) < 0.5) & (gxi > 1.0)  # (M, 2) -> l, m
            off_mask = jnp.stack(
                [jnp.ones_like(j_m[:, 0]), j_m[:, 0], j_m[:, 1], l_m[:, 0], l_m[:, 1]]
            )  # (5, M)

            # slots: (5, na, M)
            slot = off_mask[:, None, :] & match[None, :, :]
            off = jnp.asarray(_OFF)  # (5, 2)

            gij = jnp.floor(gxy[None, :, :] - off[:, None, :])  # (5, M, 2)
            gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)  # (5, M)
            gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

            # broadcast to slot shape (5, na, M)
            b_idx = jnp.broadcast_to(targets[:, 0].astype(jnp.int32)[None, None, :], slot.shape)
            a_idx = jnp.broadcast_to(jnp.arange(na, dtype=jnp.int32)[None, :, None], slot.shape)
            gi_s = jnp.broadcast_to(gi[:, None, :], slot.shape)
            gj_s = jnp.broadcast_to(gj[:, None, :], slot.shape)

            txy = gxy[None, None, :, :] - jnp.stack([gi_s, gj_s], axis=-1).astype(jnp.float32)
            twh = jnp.broadcast_to(t[None, None, :, 4:6], slot.shape + (2,))
            tbox = jnp.concatenate([txy, twh], axis=-1)  # (5, na, M, 4)
            tcls = jnp.broadcast_to(targets[:, 1].astype(jnp.int32)[None, None, :], slot.shape)
            anc = jnp.broadcast_to(anchors[li][None, :, None, :], slot.shape + (2,))  # (5, na, M, 2)

            # flatten slots
            S = 5 * na * m_t
            slot_f = slot.reshape(S)
            b_f, a_f = b_idx.reshape(S), a_idx.reshape(S)
            gi_f, gj_f = gi_s.reshape(S), gj_s.reshape(S)
            tbox_f = tbox.reshape(S, 4)
            tcls_f = tcls.reshape(S)
            anc_f = anc.reshape(S, 2)

            n_slots = jnp.maximum(slot_f.sum(), 1).astype(jnp.float32)

            # --- gather predictions at slots (losses.py:253) --------------
            ps = pred[b_f, gj_f, gi_f, a_f]  # (S, 5+nc)

            # --- box regression: CIoU (losses.py:254-260) -----------------
            pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * anc_f
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            iou = bbox_iou(pbox, tbox_f, x1y1x2y2=False, c_iou=True)  # (S,)
            lbox = lbox + jnp.where(slot_f, 1.0 - iou, 0.0).sum() / n_slots

            # --- objectness target map (losses.py:263-273), gr = 1.0 ------
            score_iou = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            tobj = jnp.zeros((bs, ny, nx, na), jnp.float32)
            tobj = tobj.at[b_f, gj_f, gi_f, a_f].max(jnp.where(slot_f, score_iou, 0.0))

            obj_bce = _bce_with_logits(pred[..., 4], tobj, hyp["obj_pw"])
            obj_bce = self._modulate(obj_bce, pred[..., 4], tobj, gamma)
            if image_weight is not None:
                w = image_weight.astype(jnp.float32)
                obj_mean = (obj_bce * w[:, None, None, None]).sum() / (
                    jnp.maximum(w.sum(), 1.0) * ny * nx * na
                )
            else:
                obj_mean = obj_bce.mean()
            lobj = lobj + obj_mean * self.balance[li]

            # --- classification (losses.py:276-280) -----------------------
            if self.nc > 1:
                t_cls = jnp.full((S, self.nc), cn, jnp.float32)
                t_cls = t_cls.at[jnp.arange(S), tcls_f].set(cp)
                cls_bce = _bce_with_logits(ps[:, 5:], t_cls, hyp["cls_pw"])
                cls_bce = self._modulate(cls_bce, ps[:, 5:], t_cls, gamma)
                cls_bce = jnp.where(slot_f[:, None], cls_bce, 0.0)
                lcls = lcls + cls_bce.sum() / (n_slots * self.nc)

        lbox = lbox * hyp["box"]
        lobj = lobj * hyp["obj"]
        lcls = lcls * hyp["cls"]
        total = lbox + lobj + lcls
        return total * bs, jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls, total]))

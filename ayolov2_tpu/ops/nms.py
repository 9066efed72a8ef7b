"""Fixed-shape batched NMS for TPU — the whole path stays on device.

Re-designs the reference's per-image Python NMS loops
(scripts/utils/nms.py:15-116, scripts/utils/metrics.py:285-443) as one
static-shape batched XLA program, mirroring the output contract of the
reference's TensorRT BatchedNMS plugin (scripts/model_converter/
model_converter.py:382-387): ``(bs, keep_top_k, 6)`` [x1 y1 x2 y2 conf cls]
plus per-image valid counts — exactly what ``convert_trt_out``
(scripts/utils/train_utils.py:262-283) consumes.

All five reference NMS variants are supported:
  - "nms" / "batched_nms": greedy hard suppression (identical keep-sets:
    both suppress within-class via the +4096*class coordinate offset trick)
  - "fast_nms" (YOLACT): keep = column-max of upper-triangular IoU < thr
  - "matrix_nms" (SOLOv2): gaussian score decay, no hard suppression
  - "merge_nms": greedy + weighted box merging over the IoU mask (a matmul)

TPU-first notes: candidate selection is two ``lax.top_k``s (objectness
pre-filter then confidence top-k), suppression is a K x K IoU matrix plus a
``fori_loop`` of vector updates (K = pre_top_k, default 512) — all static
shapes, batch-vmapped, fully fusable by XLA. No host round-trips.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.utils.constants import (
    DEFAULT_CONF_THRESHOLD,
    DEFAULT_IOU_THRESHOLD,
    DEFAULT_KEEP_TOP_K,
    DEFAULT_NMS_BOX,
    DEFAULT_TOP_K,
)

MAX_WH = 4096.0  # class-separation coordinate offset (metrics.py:332)
DEFAULT_MAX_NMS_CAP = 30000  # metrics.py:327 max_nms


def _xywh2xyxy(b: jax.Array) -> jax.Array:
    xy, wh = b[..., :2], b[..., 2:4]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def _box_iou_matrix(boxes: jax.Array, eps: float = 1e-7) -> jax.Array:
    """(K, 4) xyxy -> (K, K) pairwise IoU."""
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:4], boxes[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area[:, None] + area[None, :] - inter + eps)


def _greedy_suppress(iou: jax.Array, valid: jax.Array, iou_thres: float) -> jax.Array:
    """Greedy NMS keep-mask over score-descending candidates.

    Sequential semantics (identical keep-set to torchvision.ops.nms): row i
    suppresses lower-scored j only if i itself survived — the recurrence
    ``x_j = valid_j ∧ ¬∃ i<j : x_i ∧ iou[i,j] > thr``.

    TPU-first: solved by Jacobi fixed-point iteration instead of K
    sequential steps. The dependency graph (strictly upper-triangular) is a
    DAG, so iterating ``x ← F(x)`` from ``x = valid`` pins every candidate
    whose suppression-chain depth ≤ t after t sweeps, and any fixpoint is
    the unique greedy solution. Real scenes converge in < ~8 sweeps, each a
    single K-wide masked matvec (MXU/VPU work), versus K = 512 dependent
    scalar-indexed updates in the naive loop.
    """
    k = iou.shape[0]
    # S[i, j] = higher-scored i would suppress j (strict upper triangle).
    # Stored bf16: the matvec re-reads S every sweep, so halving its bytes
    # halves the sweep's HBM traffic; entries are exactly 0/1 and the
    # matvec accumulates in f32, so the count stays exact.
    sup = ((iou > iou_thres) & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])).astype(
        jnp.bfloat16
    )

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        x, _ = carry
        # (k,) — #surviving suppressors of j, exact f32 accumulation
        hits = jax.lax.dot_general(
            x.astype(jnp.bfloat16), sup,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x_new = valid & (hits < 0.5)
        return x_new, jnp.any(x_new != x)

    x, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "nms_box", "pre_top_k", "keep_top_k",
        "agnostic", "multi_label", "nms_type",
    ),
)
def batched_nms(
    prediction: jax.Array,
    conf_thres: float = DEFAULT_CONF_THRESHOLD,
    iou_thres: float = DEFAULT_IOU_THRESHOLD,
    nms_box: int = DEFAULT_NMS_BOX,
    pre_top_k: int = DEFAULT_TOP_K,
    keep_top_k: int = DEFAULT_KEEP_TOP_K,
    agnostic: bool = False,
    multi_label: bool = True,
    nms_type: str = "nms",
) -> Tuple[jax.Array, jax.Array]:
    """Batched fixed-shape NMS.

    Args:
        prediction: (bs, N, 5+nc) decoded model output — xywh pixels, obj, cls
            probabilities (post-sigmoid).
        conf_thres: minimum obj*cls confidence.
        iou_thres: IoU suppression threshold.
        nms_box: objectness pre-filter top-k (reference nms.py:55 ``nms_box``).
        pre_top_k: confidence top-k entering suppression (TRT ``topK``).
        keep_top_k: fixed output detections per image (TRT ``keepTopK``).
        agnostic: class-agnostic suppression.
        multi_label: allow multiple classes per box (reference batched_nms
            semantics, nms.py:60-62); False = best class only.
        nms_type: one of nms | batched_nms | fast_nms | matrix_nms | merge_nms.

    Returns:
        detections: (bs, keep_top_k, 6) [x1, y1, x2, y2, conf, cls], zero-padded.
        n_valid: (bs,) int32 count of valid rows per image.
    """
    if nms_type not in ("nms", "batched_nms", "fast_nms", "matrix_nms", "merge_nms"):
        raise ValueError(f"Wrong NMS type: {nms_type!r}")
    nc = prediction.shape[-1] - 5
    nms_box = min(nms_box, prediction.shape[1])

    def per_image(pred: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # 1) objectness pre-filter (nms.py:40-41)
        obj = pred[:, 4]
        _, oidx = jax.lax.top_k(obj, nms_box)
        x = pred[oidx]  # (nms_box, 5+nc)

        # 2) candidate scores
        confs = x[:, 5:] * x[:, 4:5]  # (nms_box, nc)
        if multi_label:
            flat = confs.reshape(-1)  # (nms_box * nc,)
            k = min(pre_top_k, flat.shape[0])
            scores, fidx = jax.lax.top_k(flat, k)
            bidx = fidx // nc
            cls = (fidx % nc).astype(jnp.float32)
        else:
            best = jnp.max(confs, axis=-1)
            k = min(pre_top_k, best.shape[0])
            scores, bidx = jax.lax.top_k(best, k)
            cls = jnp.argmax(confs, axis=-1)[bidx].astype(jnp.float32)

        boxes = _xywh2xyxy(x[bidx, :4])  # (k, 4)
        valid = scores > conf_thres
        return _suppress_and_select(
            boxes, scores, cls, valid, iou_thres, keep_top_k, agnostic, nms_type
        )

    return jax.vmap(per_image)(prediction)


def _suppress_and_select(
    boxes: jax.Array,
    scores: jax.Array,
    cls: jax.Array,
    valid: jax.Array,
    iou_thres: float,
    keep_top_k: int,
    agnostic: bool,
    nms_type: str,
) -> Tuple[jax.Array, jax.Array]:
    """Steps 3-5 of per-image NMS: class-offset suppression + fixed top-k."""
    # class separation via coordinate offset (nms.py:59-61)
    off = jnp.zeros_like(cls) if agnostic else cls * MAX_WH
    oboxes = boxes + off[:, None]

    if nms_type in ("nms", "batched_nms", "merge_nms"):
        iou = _box_iou_matrix(oboxes)
        keep = _greedy_suppress(iou, valid, iou_thres)
        if nms_type == "merge_nms":
            # weighted merge over the IoU mask (metrics.py:425-436): one matmul
            w = (iou > iou_thres) & valid[None, :]
            w = w.astype(boxes.dtype) * scores[None, :]
            denom = w.sum(axis=1, keepdims=True)
            merged = (w @ boxes) / jnp.maximum(denom, 1e-12)
            boxes = jnp.where(keep[:, None] & (denom > 0), merged, boxes)
        out_scores = scores
    elif nms_type == "fast_nms":
        iou = jnp.triu(_box_iou_matrix(oboxes), k=1)
        iou = jnp.where(valid[None, :] & valid[:, None], iou, 0.0)
        keep = (iou.max(axis=0) < iou_thres) & valid
        out_scores = scores
    else:  # matrix_nms: score decay, keep everything above threshold
        iou = jnp.triu(_box_iou_matrix(oboxes), k=1)
        iou = jnp.where(valid[None, :] & valid[:, None], iou, 0.0)
        m = iou.max(axis=0)[:, None]
        decay = jnp.exp(-(iou ** 2 - m ** 2) / 0.5).min(axis=0)
        out_scores = scores * decay
        keep = valid

    # fixed keep_top_k output, score-sorted
    final = jnp.where(keep, out_scores, -1.0)
    kk = min(keep_top_k, final.shape[0])
    top_scores, tidx = jax.lax.top_k(final, kk)
    n_valid = jnp.sum(top_scores > 0).astype(jnp.int32)
    det = jnp.concatenate(
        [boxes[tidx], top_scores[:, None], cls[tidx][:, None]], axis=-1
    )
    det = jnp.where((top_scores > 0)[:, None], det, 0.0)
    return det, n_valid


def flat_grid_meta(
    strides: Sequence[float],
    anchor_grid: np.ndarray,
    img_hw: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flattened decode constants matching the head's (ny*nx*na) order.

    Returns (grid_xy (N, 2), anchor_wh (N, 2), stride (N, 1)) fp32 arrays
    where N = sum over levels of ny*nx*na — precomputed once so the fused
    serving path decodes only gathered candidates.
    """
    grids, anchors_flat, strides_flat = [], [], []
    for level, s in enumerate(strides):
        ny, nx = int(img_hw[0] / s), int(img_hw[1] / s)
        na = anchor_grid.shape[1]
        yv, xv = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        g = np.stack([xv, yv], -1).reshape(ny * nx, 1, 2).repeat(na, 1)  # (ny*nx, na, 2)
        grids.append(g.reshape(-1, 2))
        anchors_flat.append(np.broadcast_to(anchor_grid[level][None], (ny * nx, na, 2)).reshape(-1, 2))
        strides_flat.append(np.full((ny * nx * na, 1), s))
    return (
        np.concatenate(grids).astype(np.float32),
        np.concatenate(anchors_flat).astype(np.float32),
        np.concatenate(strides_flat).astype(np.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "nms_box", "pre_top_k", "keep_top_k",
        "agnostic", "multi_label", "nms_type", "approx_prefilter",
    ),
)
def fused_decode_nms(
    raw_flat,
    grid_xy: jax.Array,
    anchor_wh: jax.Array,
    stride: jax.Array,
    conf_thres: float = DEFAULT_CONF_THRESHOLD,
    iou_thres: float = DEFAULT_IOU_THRESHOLD,
    nms_box: int = DEFAULT_NMS_BOX,
    pre_top_k: int = DEFAULT_TOP_K,
    keep_top_k: int = DEFAULT_KEEP_TOP_K,
    agnostic: bool = False,
    multi_label: bool = False,
    nms_type: str = "nms",
    approx_prefilter: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Decode + NMS fused: full decode happens ONLY for top candidates.

    The plain path decodes all N anchors to fp32 (sigmoid + grid math over
    (bs, N, 5+nc)) before NMS — HBM-bound at ~274 MB/batch for yolov5s@640.
    Here the objectness pre-filter (reference nms.py:40-41 ``nms_box``) runs
    on the bf16 raw logits; only the surviving ``nms_box`` rows are gathered
    and decoded in fp32. Same candidate semantics, ~1/25th the decode traffic.

    Args:
        raw_flat: (bs, N, 5+nc) raw head outputs (pre-sigmoid, any dtype),
            flattened in the head's ny*nx*na level order.
        grid_xy / anchor_wh / stride: constants from :func:`flat_grid_meta`.

    Note: a per-level-maps input form (objectness sliced from each level map
    before the concat) measured FASTER in isolation (1.84 -> 1.07 ms for
    prefilter+gather at bs32@640) but 0.6 ms SLOWER end-to-end — it breaks
    XLA's overlap of the head with the decode. Kept flat on purpose.
    """
    obj = raw_flat[..., 4]
    nc = raw_flat.shape[-1] - 5
    k0 = min(nms_box, raw_flat.shape[1])
    # objectness pre-filter on raw logits (sigmoid is monotonic).
    # approx_prefilter swaps the exact sort for the TPU-optimized
    # approx_max_k (recall 0.99 against the top-k0 of N): an explicit
    # serving speed/quality knob in the spirit of the reference's NMS
    # variants; default off — exact TRT-plugin semantics.
    if approx_prefilter:
        _, oidx_all = jax.lax.approx_max_k(
            obj.astype(jnp.float32), k0, recall_target=0.99
        )
    else:
        _, oidx_all = jax.lax.top_k(obj, k0)  # (bs, k0)

    def per_image(raw: jax.Array, oidx: jax.Array) -> Tuple[jax.Array, jax.Array]:
        rows = jax.nn.sigmoid(raw[oidx].astype(jnp.float32))  # (k0, 5+nc)
        xy = (rows[:, 0:2] * 2.0 - 0.5 + grid_xy[oidx]) * stride[oidx]
        wh = (rows[:, 2:4] * 2.0) ** 2 * anchor_wh[oidx]
        confs = rows[:, 5:] * rows[:, 4:5]  # (k0, nc)

        if multi_label:
            flat = confs.reshape(-1)
            k = min(pre_top_k, flat.shape[0])
            scores, fidx = jax.lax.top_k(flat, k)
            bidx = fidx // nc
            cls = (fidx % nc).astype(jnp.float32)
        else:
            best = jnp.max(confs, axis=-1)
            k = min(pre_top_k, best.shape[0])
            scores, bidx = jax.lax.top_k(best, k)
            cls = jnp.argmax(confs, axis=-1)[bidx].astype(jnp.float32)

        cxy, cwh = xy[bidx], wh[bidx]
        boxes = jnp.concatenate([cxy - cwh / 2, cxy + cwh / 2], axis=-1)
        valid = scores > conf_thres
        return _suppress_and_select(
            boxes, scores, cls, valid, iou_thres, keep_top_k, agnostic, nms_type
        )

    return jax.vmap(per_image)(raw_flat, oidx_all)


def flatten_raw_maps(raw: Sequence[jax.Array]) -> jax.Array:
    """nl raw maps (bs, ny, nx, na, no) -> (bs, N, no), level order preserved."""
    return jnp.concatenate(
        [r.reshape(r.shape[0], -1, r.shape[-1]) for r in raw], axis=1
    )


def detections_to_list(
    detections: np.ndarray, n_valid: np.ndarray
) -> List[np.ndarray]:
    """Host-side: fixed (bs, K, 6) + counts -> per-image (n_i, 6) arrays."""
    return [np.asarray(detections[i, : int(n_valid[i])]) for i in range(len(n_valid))]


def non_max_suppression_np(
    prediction: np.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    multi_label: bool = False,
    agnostic: bool = False,
    labels: Optional[List[np.ndarray]] = (),
    max_det: int = 300,
    nms_type: str = "nms",
    pre_top_k: int = DEFAULT_TOP_K,
    classes: Optional[List[int]] = None,
) -> List[np.ndarray]:
    """Reference-shaped API over the fixed-shape device NMS.

    Mirrors non_max_suppression (metrics.py:285-443) including hybrid-label
    injection: ``labels[i]`` rows (cls, x, y, w, h) are appended as perfect
    detections before suppression (metrics.py:341-348) and the ``classes``
    debug filter (metrics.py:366-368). Returns per-image (n, 6) numpy
    arrays for the validator.
    """
    pred = np.asarray(prediction, dtype=np.float32)
    if labels and any(len(lb) for lb in labels):
        nc = pred.shape[2] - 5
        padded = []
        width = max(len(lb) for lb in labels)
        for i, lb in enumerate(labels):
            v = np.zeros((width, nc + 5), dtype=np.float32)
            if len(lb):
                lb = np.asarray(lb, dtype=np.float32)
                v[: len(lb), :4] = lb[:, 1:5]
                v[: len(lb), 4] = 1.0
                v[np.arange(len(lb)), lb[:, 0].astype(int) + 5] = 1.0
            padded.append(v)
        pred = np.concatenate([pred, np.stack(padded)], axis=1)

    det, n_valid = batched_nms(
        jnp.asarray(pred),
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        nms_box=min(DEFAULT_MAX_NMS_CAP, pred.shape[1]),
        # multi-label candidates are (box, class) pairs: cap at N*nc, not N
        pre_top_k=min(pre_top_k, pred.shape[1] * (pred.shape[2] - 5) if multi_label else pred.shape[1]),
        keep_top_k=max_det,
        agnostic=agnostic,
        multi_label=multi_label,
        nms_type=nms_type,
    )
    out = detections_to_list(np.asarray(det), np.asarray(n_valid))
    if classes is not None:  # debug class filter (metrics.py:366-368)
        cls_set = np.asarray(classes)
        out = [d[np.isin(d[:, 5], cls_set)] for d in out]
    return out

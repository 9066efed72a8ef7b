"""Box coordinate transforms and IoU family.

Behavioral parity targets (reference /root/reference):
  - xywh2xyxy / xyxy2xywh / xyn2xy / scale_coords / clip_coords:
    scripts/utils/general.py:233-358
  - bbox_ioa / bbox_iou (GIoU/DIoU/CIoU) / box_iou: scripts/utils/metrics.py:30-164

All functions are array-namespace polymorphic: they accept either `numpy`
arrays (host-side data pipeline) or `jax.numpy` arrays (on-device compute)
and dispatch to the matching namespace, so the same math serves the CPU data
loader and the jitted TPU graph. Everything is functional (no in-place
mutation) so it is safe under `jax.jit`.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jax.Array]


def _xp(x: Array):
    """Return the array namespace (numpy or jax.numpy) for ``x``."""
    return jnp if isinstance(x, jax.Array) else np


def xywh2xyxy(
    x: Array, ratio: Tuple[float, float] = (1.0, 1.0), wh: Tuple[float, float] = (1.0, 1.0), pad: Tuple[float, float] = (0.0, 0.0)
) -> Array:
    """Convert (cx, cy, w, h) boxes to (x1, y1, x2, y2).

    Optionally rescales from normalized to pixel space with per-axis ratio,
    image wh, and letterbox pad (reference general.py:296-319).
    """
    xp = _xp(x)
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    x1 = ratio[0] * wh[0] * (cx - w / 2) + pad[0]
    y1 = ratio[1] * wh[1] * (cy - h / 2) + pad[1]
    x2 = ratio[0] * wh[0] * (cx + w / 2) + pad[0]
    y2 = ratio[1] * wh[1] * (cy + h / 2) + pad[1]
    return xp.stack([x1, y1, x2, y2], axis=-1)


def xyxy2xywh(
    x: Array, wh: Tuple[float, float] = (1.0, 1.0), clip_eps: Optional[float] = None, check_validity: bool = True
) -> Array:
    """Convert (x1, y1, x2, y2) boxes to (cx, cy, w, h), normalized by ``wh``.

    Exact reference semantics (general.py:250-293):
      - ``clip_eps``: accepted for API parity but has NO observable effect —
        the reference clips into ``y`` and then overwrites every column from
        the UNCLIPPED input (general.py:278-284), so the clip is dead code;
        we reproduce the observable behavior bit-for-bit
        (tests/test_reference_parity.py)
      - ``check_validity`` (default True): shrink w/h symmetrically so the
        box fits inside [0, 1] (center preserved), then clip to [1e-12, 1]
    """
    del clip_eps  # see docstring: no observable effect in the reference
    xp = _xp(x)
    x1 = x[..., 0] / wh[0]
    y1 = x[..., 1] / wh[1]
    x2 = x[..., 2] / wh[0]
    y2 = x[..., 3] / wh[1]
    cx = (x1 + x2) / 2
    cy = (y1 + y2) / 2
    w = x2 - x1
    h = y2 - y1
    if check_validity:
        w = w + xp.minimum(cx - w / 2, 0.0) * 2
        w = w - (xp.maximum(cx + w / 2, 1.0) - 1.0) * 2
        h = h + xp.minimum(cy - h / 2, 0.0) * 2
        h = h - (xp.maximum(cy + h / 2, 1.0) - 1.0) * 2
    out = xp.stack([cx, cy, w, h], axis=-1)
    if check_validity:
        out = xp.clip(out, 1e-12, 1.0)
    return out


def xyn2xy(
    x: Array, ratio: Tuple[float, float] = (1.0, 1.0), wh: Tuple[float, float] = (1.0, 1.0), pad: Tuple[float, float] = (0.0, 0.0)
) -> Array:
    """Convert normalized segment points to pixel coords (general.py:233-240)."""
    xp = _xp(x)
    px = ratio[0] * wh[0] * x[..., 0] + pad[0]
    py = ratio[1] * wh[1] * x[..., 1] + pad[1]
    return xp.stack([px, py], axis=-1)


def clip_coords(boxes: Array, wh: Tuple[float, float]) -> Array:
    """Clip xyxy boxes to image bounds (functional; general.py:347-358)."""
    xp = _xp(boxes)
    lo = xp.zeros((4,), dtype=boxes.dtype)
    hi = xp.asarray([wh[0], wh[1], wh[0], wh[1]], dtype=boxes.dtype)
    return xp.clip(boxes, lo, hi)


def scale_coords(
    img1_shape: Tuple[int, int],
    coords: Array,
    img0_shape: Tuple[int, int],
    ratio_pad: Optional[Tuple[Tuple[float, float], Tuple[float, float]]] = None,
) -> Array:
    """Rescale xyxy coords from letterboxed ``img1_shape`` (h, w) to native ``img0_shape``.

    Mirrors reference general.py:322-344: gain = min(h1/h0, w1/w0),
    pad = ((w1 - w0*gain)/2, (h1 - h0*gain)/2), then de-pad, de-scale, clip.
    """
    xp = _xp(coords)
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]

    shift = xp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=coords.dtype)
    out = (coords - shift) / gain
    return clip_coords(out, (img0_shape[1], img0_shape[0]))


def box_area(box: Array) -> Array:
    """Area of xyxy boxes (..., 4) -> (...)."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(box1: Array, box2: Array, eps: float = 1e-7) -> Array:
    """Pairwise IoU of two xyxy box sets: (N, 4), (M, 4) -> (N, M).

    Parity: scripts/utils/metrics.py:120-164 (torchvision-style box_iou).
    """
    xp = _xp(box1)
    area1 = box_area(box1)  # (N,)
    area2 = box_area(box2)  # (M,)
    lt = xp.maximum(box1[:, None, :2], box2[None, :, :2])  # (N, M, 2)
    rb = xp.minimum(box1[:, None, 2:4], box2[None, :, 2:4])  # (N, M, 2)
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def bbox_ioa(box1: Array, box2: Array, eps: float = 1e-7) -> Array:
    """Intersection over box2 area: (4,), (N, 4) -> (N,) (metrics.py:30-60)."""
    xp = _xp(box2)
    b1 = box1.reshape(-1, 4)
    lt = xp.maximum(b1[:, None, :2], box2[None, :, :2])
    rb = xp.minimum(b1[:, None, 2:4], box2[None, :, 2:4])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area2 = box_area(box2)
    out = inter / (area2[None, :] + eps)
    return out[0] if box1.ndim == 1 else out


def bbox_iou(
    box1: Array,
    box2: Array,
    x1y1x2y2: bool = True,
    g_iou: bool = False,
    d_iou: bool = False,
    c_iou: bool = False,
    eps: float = 1e-7,
) -> Array:
    """Elementwise IoU / GIoU / DIoU / CIoU of aligned boxes.

    Accepts boxes shaped (..., 4) (last axis = coords). Parity target:
    scripts/utils/metrics.py:63-117 (which takes (4, n) transposed input;
    we use the more natural (..., 4) and adapt at call sites).
    """
    xp = _xp(box1)
    if x1y1x2y2:
        b1_x1, b1_y1, b1_x2, b1_y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2_x1, b2_y1, b2_x2, b2_y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
    else:  # xywh -> xyxy
        b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = xp.clip(xp.minimum(b1_x2, b2_x2) - xp.maximum(b1_x1, b2_x1), 0, None) * xp.clip(
        xp.minimum(b1_y2, b2_y2) - xp.maximum(b1_y1, b2_y1), 0, None
    )

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (g_iou or d_iou or c_iou):
        return iou

    cw = xp.maximum(b1_x2, b2_x2) - xp.minimum(b1_x1, b2_x1)  # convex width
    ch = xp.maximum(b1_y2, b2_y2) - xp.minimum(b1_y1, b2_y1)  # convex height
    if c_iou or d_iou:
        c2 = cw ** 2 + ch ** 2 + eps  # convex diagonal squared
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if d_iou:
            return iou - rho2 / c2
        # CIoU https://arxiv.org/abs/1911.08287v1
        v = (4 / np.pi ** 2) * (xp.arctan(w2 / h2) - xp.arctan(w1 / h1)) ** 2
        if xp is jnp:
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        else:
            alpha = v / (v - iou + (1 + eps))
        return iou - (rho2 / c2 + v * alpha)
    # GIoU https://arxiv.org/pdf/1902.09630.pdf
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def wh_iou(wh1: Array, wh2: Array, eps: float = 1e-7) -> Array:
    """IoU of width-height pairs assuming co-centered boxes: (N,2),(M,2)->(N,M)."""
    xp = _xp(wh1)
    inter = xp.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    return inter / (wh1[:, None, :].prod(-1) + wh2[None, :, :].prod(-1) - inter + eps)

"""Test-time augmentation — multi-scale + flip inference, fully on device.

Parity target: /root/reference/scripts/utils/tta_utils.py:15-86
(``inference_with_tta`` over scales (1, 0.83, 0.67) with flips (none, lr,
none), ``descale_pred`` inverse transform, ``clip_augmented`` tail trimming)
and scripts/utils/torch_utils.py:305-331 (``scale_img`` pad-to-stride
resize, pad value 0.447).

TPU-first: every augmented branch is a static-shape resize + forward inside
the same jit — three compiled sub-graphs fused into one program, no host
round-trips between branches.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_SCALES: Tuple[float, ...] = (1.0, 0.83, 0.67)
DEFAULT_FLIPS: Tuple[Optional[int], ...] = (None, 2, None)  # 2 = width axis of NHWC


def scale_img(img: jax.Array, ratio: float = 1.0, gs: int = 32, pad_value: float = 0.447) -> jax.Array:
    """Resize NHWC batch by ``ratio`` and pad to a ``gs``-multiple canvas.

    Parity: torch_utils.py:305-331 (same_shape=False branch) — bilinear
    resize then bottom/right constant pad with the ImageNet-mean gray 0.447.
    """
    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    nh, nw = int(h * ratio), int(w * ratio)
    out = jax.image.resize(img, (b, nh, nw, c), method="bilinear")
    ph = -nh % gs
    pw = -nw % gs
    if ph or pw:
        out = jnp.pad(out, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=pad_value)
    return out


def descale_pred(pred: jax.Array, flip: Optional[int], scale: float, img_wh: Tuple[int, int]) -> jax.Array:
    """Undo scale/flip on decoded (bs, n, 5+nc) xywh predictions.

    Parity: tta_utils.py descale_pred — divide coords by scale, mirror x
    (flip=2/width) or y (flip=1/height) about the original image extent.
    """
    xy = pred[..., :2] / scale
    wh = pred[..., 2:4] / scale
    x, y = xy[..., 0:1], xy[..., 1:2]
    if flip == 1:  # up-down
        y = img_wh[1] - y
    elif flip == 2:  # left-right
        x = img_wh[0] - x
    return jnp.concatenate([x, y, wh, pred[..., 4:]], axis=-1)


def clip_augmented(ys: List[jax.Array], nl: int, grid_points: Sequence[int]) -> List[jax.Array]:
    """Trim TTA tails (tta_utils.py clip_augmented semantics).

    Drops the large-object grid cells of the first (scale-1) prediction and
    the small-object cells of the last augmented prediction. ``grid_points``
    is the per-level anchor-point count (na*ny*nx) of the *unscaled* decode,
    used to size the trims exactly.
    """
    g = sum(4 ** x for x in range(nl))
    e = 1  # number of levels to trim
    n0 = (ys[0].shape[1] // g) * sum(4 ** x for x in range(e))
    ys[0] = ys[0][:, : ys[0].shape[1] - n0]  # drop largest-stride tail
    nl_last = (ys[-1].shape[1] // g) * sum(4 ** (nl - 1 - x) for x in range(e))
    ys[-1] = ys[-1][:, nl_last:]  # drop smallest-stride head
    return ys


def inference_with_tta(
    forward: Callable[[jax.Array], jax.Array],
    imgs: jax.Array,
    nl: int = 3,
    gs: int = 32,
    scales: Sequence[float] = DEFAULT_SCALES,
    flips: Sequence[Optional[int]] = DEFAULT_FLIPS,
) -> jax.Array:
    """Multi-scale + flip inference (tta_utils.py:62-86).

    Args:
        forward: normalized NHWC float batch -> decoded (bs, n, 5+nc) xywh.
        imgs: normalized (0..1) NHWC float batch at the base resolution.
        nl: number of head levels (for clip_augmented).
        gs: grid stride for pad-to-multiple.

    Returns:
        (bs, n_total, 5+nc) concatenated de-scaled predictions.
    """
    h, w = imgs.shape[1], imgs.shape[2]
    ys: List[jax.Array] = []
    for scale, flip in zip(scales, flips):
        x = jnp.flip(imgs, axis=flip) if flip else imgs
        x = scale_img(x, scale, gs=gs)
        y = forward(x)
        ys.append(descale_pred(y, flip, scale, (w, h)))
    ys = clip_augmented(ys, nl, [y.shape[1] for y in ys])
    return jnp.concatenate(ys, axis=1)

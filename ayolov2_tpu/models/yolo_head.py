"""YOLOv5 detection head with on-device decode (NHWC).

Re-creation of kindle's YOLOHead as used by the reference (SURVEY.md §2.2):
  - train mode -> list of nl raw maps; here laid out (bs, ny, nx, na, 5+nc)
    (channels-last analogue of the torch (bs, na, ny, nx, 5+nc);
    reference consumers: scripts/loss/losses.py:350).
  - eval mode -> (decoded (bs, sum na*ny*nx, 5+nc), train_out) where decode is
    the YOLOv5 parameterization xy = (2*sigmoid - 0.5 + grid) * stride,
    wh = (2*sigmoid)^2 * anchor_pixels (mirrored at scripts/loss/losses.py:254-255,
    scripts/utils/train_utils.py:436-444).
  - ``out_xyxy`` flag converts decoded boxes to xyxy for the export path
    (export.py:171).

TPU-first notes: grids and anchor grids are precomputed constants folded into
the jitted graph (no data-dependent shapes); decode is pure VPU elementwise
work that XLA fuses into the head convs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def make_grid(ny: int, nx: int) -> np.ndarray:
    """(ny, nx, 1, 2) grid of cell top-left indices, xy order."""
    yv, xv = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    return np.stack([xv, yv], axis=-1).reshape(ny, nx, 1, 2).astype(np.float32)


def check_anchor_order(anchors: np.ndarray, strides: Sequence[float]) -> np.ndarray:
    """Ensure anchor areas grow with stride; flip if inverted.

    Parity: scripts/utils/anchors.py check_anchor_order usage.
    ``anchors`` is (nl, na, 2) in pixel units.
    """
    a = anchors.reshape(len(strides), -1, 2)
    area = a.prod(-1).mean(-1)  # (nl,)
    da = area[-1] - area[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        a = a[::-1].copy()
    return a


class YOLOHead(nn.Module):
    """Per-level 1x1 conv to na*(5+nc) channels + static-shape decode."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]  # (nl, na*2) pixel anchors from YAML
    strides: Tuple[float, ...]  # (nl,) inferred by the builder
    out_xyxy: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    def anchor_grid(self) -> np.ndarray:
        """Pixel-space anchors (nl, na, 2), stride-order corrected."""
        a = np.asarray(self.anchors, dtype=np.float32).reshape(self.nl, self.na, 2)
        return check_anchor_order(a, self.strides)

    def stride_anchors(self) -> np.ndarray:
        """Stride-normalized anchors (nl, na, 2) — the loss-space anchors."""
        return self.anchor_grid() / np.asarray(self.strides, dtype=np.float32).reshape(-1, 1, 1)

    def _bias_init_for_level(self, i: int, img_size: float = 640.0):
        """YOLOv5 prior bias init: obj ~ 8 objects/640px image, cls ~ 0.6/(nc-1)."""
        na, no, nc = self.na, self.no, self.nc
        s = self.strides[i]

        def init(key, shape, dtype=jnp.float32):
            b = np.zeros((na, no), dtype=np.float32)
            b[:, 4] += np.log(8.0 / (img_size / s) ** 2)
            b[:, 5:] += np.log(0.6 / (nc - 0.999999)) if nc > 1 else 0.0
            return jnp.asarray(b.reshape(-1), dtype=dtype)

        return init

    @nn.compact
    def __call__(
        self, xs: List[jax.Array], training: bool = False
    ) -> Tuple[Optional[jax.Array], List[jax.Array]]:
        """Forward. xs: nl feature maps (bs, ny, nx, c) fine-to-coarse.

        Returns (decoded_or_None, raw_maps). decoded is None in training mode.
        """
        assert len(xs) == self.nl, f"expected {self.nl} feature maps, got {len(xs)}"
        raw: List[jax.Array] = []
        for i, x in enumerate(xs):
            y = nn.Conv(
                self.na * self.no,
                (1, 1),
                use_bias=True,
                bias_init=self._bias_init_for_level(i),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"m{i}",
            )(x)
            bs, ny, nx, _ = y.shape
            raw.append(y.reshape(bs, ny, nx, self.na, self.no))

        if training:
            return None, raw

        anchor_grid = self.anchor_grid()  # (nl, na, 2) pixels
        decoded = []
        for i, y in enumerate(raw):
            bs, ny, nx = y.shape[0], y.shape[1], y.shape[2]
            sig = jax.nn.sigmoid(y.astype(jnp.float32))
            grid = jnp.asarray(make_grid(ny, nx))  # (ny, nx, 1, 2)
            xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * self.strides[i]
            wh = (sig[..., 2:4] * 2.0) ** 2 * jnp.asarray(anchor_grid[i])
            out = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
            decoded.append(out.reshape(bs, ny * nx * self.na, self.no))
        z = jnp.concatenate(decoded, axis=1)

        if self.out_xyxy:
            xy, wh, rest = z[..., 0:2], z[..., 2:4], z[..., 4:]
            z = jnp.concatenate([xy - wh / 2, xy + wh / 2, rest], axis=-1)
        return z, raw

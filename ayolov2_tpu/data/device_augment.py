"""On-device training augmentation: mosaic + warp + HSV + flips as one jit.

The reference's training augmentation is an all-host cv2/numpy hot loop
(/root/reference/scripts/data_loader/data_loader.py:613-724 __getitem__,
mosaic :726-830; HSV /root/reference/scripts/augmentation/
yolo_augmentation.py:397-422) — measured here at ~65 img/s on a 1-core VM
against a 711 img/s bs128 device train step (runs/bench_matrix): training is
~11x loader-bound, and the gap scales with every chip added to the mesh.

This module moves the PIXEL work onto the TPU while the (cheap) geometry and
label math stay on host with the exact same seeded RNG stream:

  host (loader workers)              device (one jitted program per batch)
  ---------------------              -------------------------------------
  draw mosaic center + indices       gather 4 source frames per sample
  draw perspective matrix M          fused paste+warp: one bilinear resample
  transform + filter labels          of the virtual 2s x 2s mosaic canvas
  draw HSV gains / flip flags        through M^-1 (no canvas materialized)
  (datasets.DetectionDataset         HSV jitter in cv2's uint8 conventions
   .plan_item — same rng ORDER        flips, mixup blend
   as the host get_item path)        -> (B, s, s, 3) uint8 training batch

Key design points (TPU-first):
  - The mosaic canvas is never materialized: every output pixel back-projects
    through M^-1 into canvas coordinates, resolves which of the 4 paste
    rectangles contains each bilinear tap (pure int arithmetic), and gathers
    directly from the source frame — paste-then-warp pixel semantics match
    cv2.warpAffine(borderValue=114) exactly because canvas background and
    out-of-canvas border share the 114 fill.
  - TWO renderers, selected per batch ("auto"): the general one gathers
    (any warp), but TPU random gathers are slow — at 640px it is pixel-bound
    (runs/bench_matrix/matrix_r5_train_e2e_640.json). The reference's
    DEFAULT recipe has degrees == shear == perspective == 0
    (res/configs/cfg/train_config.yaml, mirroring the reference's
    train_config), making M^-1 axis-aligned: the back-projection factorizes
    per axis and the whole mosaic-paste + affine resample becomes, per
    quadrant k,  out += R_k @ frame_k @ C_k^T  with banded bilinear weight
    matrices — pure MXU batched matmuls, zero gathers ("separable" mode).
  - Source frames ride to the device as uint8 and can be RESIDENT: a
    dataset that fits HBM (golden/fixture runs; 96 imgs @320 = 28 MB) is
    uploaded once and each batch transfers only indices + a few hundred
    bytes of geometry. Streaming mode ships (B, P, 4, s, s, 3) uint8.
  - Frames are a TRACED argument, never a jit closure constant (a baked
    dataset would blow the remote compiler's ~150 MB payload limit the same
    way closure-captured yolov5x weights did — CLAUDE.md).
  - Everything is static-shape: 4 slots always (letterbox items use slot 0
    with an empty rect for the rest), a fixed pair dim P (2 when the config
    enables mixup, else 1).

Pixel parity vs the host path (tests/test_device_augment.py): labels are
bit-identical (same code computes them); images match within interpolation
rounding (cv2 warpAffine uses 5-bit fixed-point bilinear weights, cv2 HSV
round-trips through integer H/S/V — this renderer keeps float precision and
rounds once).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FILL = 114.0


class PlanBatch:
    """One collated device-augmentation batch.

    Geometry arrays carry a pair dim P (mixup partners; P=1 when the config
    disables mixup):
      src        (B, P, 4, s, s, 3) uint8 source frames, or None (resident)
      src_idx    (B, P, 4) int32   dataset indices (resident-frame gather)
      rects      (B, P, 4, 4) int32  per-slot canvas paste rect x1,y1,x2,y2
      offs       (B, P, 4, 2) int32  canvas->source offset (dx, dy)
      minv       (B, P, 3, 3) float32 output->canvas back-projection
      blend      (B,) float32 mixup weight for pair 0 (1.0 = no mixup)
      hsv        (B, 3) float32 HSV gains (1 = identity)
      flips      (B, 2) int32 (lr, ud)
    plus the standard Batch fields (targets/target_mask/paths/shapes/n_real).
    """

    __slots__ = ("src", "src_idx", "rects", "offs", "minv", "blend", "hsv",
                 "flips", "targets", "target_mask", "paths", "shapes",
                 "n_labels", "n_real", "images")

    def __init__(self, **kw):
        self.images = None  # filled by the renderer (trainer-side)
        for k, v in kw.items():
            setattr(self, k, v)


def collate_plans(items: Sequence, batch_size: int, max_labels_per_image: int,
                  n_real: Optional[int] = None) -> PlanBatch:
    """Stack (plan, labels, path, shapes) planner items into a PlanBatch."""
    from ayolov2_tpu.loss.yolo_loss import pad_targets

    plans, labels, paths, shapes = zip(*items)
    bs = len(items)
    targets, mask = pad_targets(labels, bs, bs * max_labels_per_image)
    stack = {k: np.stack([p[k] for p in plans]) for k in plans[0] if k != "src"}
    src = None
    if plans[0].get("src") is not None:
        src = np.stack([p["src"] for p in plans])
    return PlanBatch(
        src=src, targets=targets, target_mask=mask, paths=list(paths),
        shapes=list(shapes), n_labels=[len(l) for l in labels],
        n_real=bs if n_real is None else n_real, **stack,
    )


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


def _resolve_taps(src_idx, rects, offs, ui, vi, S: int):
    """Map integer canvas tap coords -> flat source-frame indices + hit mask.

    src_idx (4,) i32; rects (4,4); offs (4,2); ui/vi (npix,) i32.
    Paste rects are disjoint by construction (mosaic quadrants); first hit
    wins. Misses (canvas background / out of canvas) keep hit=False and get
    the 114 fill — identical pixels to paste-then-warpAffine.
    """
    gidx = jnp.zeros_like(ui)
    hit = jnp.zeros(ui.shape, bool)
    for k in range(4):
        in_k = (
            (ui >= rects[k, 0]) & (ui < rects[k, 2])
            & (vi >= rects[k, 1]) & (vi < rects[k, 3]) & (~hit)
        )
        sx = jnp.clip(ui - offs[k, 0], 0, S - 1)
        sy = jnp.clip(vi - offs[k, 1], 0, S - 1)
        g = src_idx[k] * (S * S) + sy * S + sx
        gidx = jnp.where(in_k, g, gidx)
        hit = hit | in_k
    return gidx, hit


def _render_canvas(frames_flat, src_idx, rects, offs, minv, out_hw: Tuple[int, int], S: int):
    """One sample, one pair member: back-project + bilinear gather.

    frames_flat (N*S*S, 3) f32; returns (h, w, 3) f32 in [0, 255] (unrounded).
    Mirrors cv2.warpAffine/warpPerspective INTER_LINEAR with constant border
    114 over the virtual paste canvas.
    """
    h, w = out_hw
    ys, xs = jnp.mgrid[0:h, 0:w]
    x = xs.reshape(-1).astype(jnp.float32)
    y = ys.reshape(-1).astype(jnp.float32)
    u = minv[0, 0] * x + minv[0, 1] * y + minv[0, 2]
    v = minv[1, 0] * x + minv[1, 1] * y + minv[1, 2]
    z = minv[2, 0] * x + minv[2, 1] * y + minv[2, 2]
    u = u / z
    v = v / z
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    acc = jnp.zeros((h * w, 3), jnp.float32)
    for du in (0, 1):
        for dv in (0, 1):
            wgt = (fu if du else 1.0 - fu) * (fv if dv else 1.0 - fv)
            gidx, hit = _resolve_taps(src_idx, rects, offs, u0 + du, v0 + dv, S)
            val = jnp.where(hit[:, None], jnp.take(frames_flat, gidx, axis=0), FILL)
            acc = acc + wgt * val
    return acc.reshape(h, w, 3)


def _axis_weight_matrix(scale, off, lo, hi, src_off, out_len: int, S: int):
    """(out_len, S) bilinear weight matrix for one axis of one paste rect.

    Output coord x back-projects to canvas u = scale*x + off; each of its two
    integer taps u0, u0+1 contributes weight (1-fu, fu) masked to the rect's
    [lo, hi) extent, landing on source column clip(u - src_off, 0, S-1) —
    the exact tap/weight/clip math of _resolve_taps/_render_canvas, factored
    per axis. Row sums give the rect's per-output-coordinate coverage (the
    fill weight rides the residual)."""
    x = jnp.arange(out_len, dtype=jnp.float32)
    u = scale * x + off
    u0f = jnp.floor(u)
    fu = u - u0f
    u0 = u0f.astype(jnp.int32)
    cols = jnp.arange(S, dtype=jnp.int32)[None, :]
    W = jnp.zeros((out_len, S), jnp.float32)
    for d, wgt in ((0, 1.0 - fu), (1, fu)):
        ut = u0 + d
        in_ax = (ut >= lo) & (ut < hi)
        sx = jnp.clip(ut - src_off, 0, S - 1)
        W = W + (wgt * in_ax)[:, None] * (sx[:, None] == cols)
    return W


def _render_canvas_separable(frames, src_idx, rects, offs, minv, out_hw: Tuple[int, int], S: int,
                             dt=jnp.float32):
    """One sample, one pair member — axis-aligned warps only.

    Requires minv[0,1] == minv[1,0] == minv[2,0] == minv[2,1] == 0 (hyp
    degrees == shear == perspective == 0, the reference's default recipe):
    then u depends only on x and v only on y, the per-quadrant hit test
    factorizes as inx_k(u)·iny_k(v), and the full bilinear resample of the
    virtual mosaic canvas is  sum_k R_k @ frame_k @ C_k^T  plus
    FILL·(1 - coverage) where coverage is the outer product of the weight
    matrices' row sums. This turns ~4·h·w random gathers per image (the
    measured 640px bottleneck — TPU gathers are slow) into batched MXU
    matmuls. frames is (N, S, S, 3) in dtype dt; returns (h, w, 3) f32
    unrounded, same values as _render_canvas up to f32 summation order.

    dt: matmul input dtype. bfloat16 runs the MXU at ~4x the f32 rate;
    accumulation stays f32 (preferred_element_type). uint8 pixels are
    exact in bf16 (integers <= 256); only the bilinear weights round
    (2^-9 relative, tighter than cv2's own 5-bit fixed-point weights on
    the host path) — measured <= 1 LSB drift vs the f32 renderer
    (tests/test_device_augment.py::test_separable_bf16_matches_f32)."""
    h, w = out_hw
    z = minv[2, 2]
    acc = jnp.zeros((h, w, 3), jnp.float32)
    cov = jnp.zeros((h, w), jnp.float32)
    for k in range(4):
        C = _axis_weight_matrix(minv[0, 0] / z, minv[0, 2] / z,
                                rects[k, 0], rects[k, 2], offs[k, 0], w, S)
        R = _axis_weight_matrix(minv[1, 1] / z, minv[1, 2] / z,
                                rects[k, 1], rects[k, 3], offs[k, 1], h, S)
        f = frames[src_idx[k]]
        t = jnp.tensordot(R.astype(dt), f, axes=((1,), (0,)),
                          preferred_element_type=jnp.float32)  # (h, S, 3): contract sy
        acc = acc + jnp.einsum("hxc,wx->hwc", t.astype(dt), C.astype(dt),
                               preferred_element_type=jnp.float32)  # contract sx
        cov = cov + R.sum(1)[:, None] * C.sum(1)[None, :]
    return acc + FILL * (1.0 - cov)[..., None]


def _hsv_jitter(img, r):
    """cv2-convention HSV jitter on a float (h, w, 3) BGR image in [0, 255].

    Matches augment_hsv's fused LUT (data/augment.py) semantics: H (cv2
    half-degrees, [0, 180)) scaled mod 180, S/V scaled + clipped — done in
    float and rounded once (the host path round-trips through integer HSV;
    differences are a few LSB, bounded in tests)."""
    b, g, rr = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), rr)
    mn = jnp.minimum(jnp.minimum(b, g), rr)
    c = v - mn
    safe_c = jnp.where(c == 0, 1.0, c)
    h = jnp.where(
        v == rr, 30.0 * (g - b) / safe_c,
        jnp.where(v == g, 60.0 + 30.0 * (b - rr) / safe_c,
                  120.0 + 30.0 * (rr - g) / safe_c),
    )
    h = jnp.where(c == 0, 0.0, h)
    h = jnp.where(h < 0, h + 180.0, h)
    s = jnp.where(v == 0, 0.0, 255.0 * c / jnp.where(v == 0, 1.0, v))

    h2 = (h * r[0]) % 180.0
    s2 = jnp.clip(s * r[1], 0, 255)
    v2 = jnp.clip(v * r[2], 0, 255)

    # HSV -> BGR (cv2 uint8 conventions: H in half-degrees)
    c2 = v2 * s2 / 255.0
    hp = h2 / 30.0  # sector in [0, 6)
    xcomp = c2 * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v2 - c2
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    # per-sector (R, G, B) selection
    r_ = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
                    [c2, xcomp, jnp.zeros_like(c2), jnp.zeros_like(c2), xcomp], c2)
    g_ = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
                    [xcomp, c2, c2, xcomp, jnp.zeros_like(c2)], jnp.zeros_like(c2))
    b_ = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
                    [jnp.zeros_like(c2), jnp.zeros_like(c2), xcomp, c2, c2], xcomp)
    return jnp.stack([b_ + m, g_ + m, r_ + m], axis=-1)


def _render_sample(frames, src_idx, rects, offs, minv, blend, hsv, flips,
                   out_hw: Tuple[int, int], S: int, pairs: int, canvas_fn=_render_canvas):
    """Full per-sample augmentation: render pair(s), mixup blend, HSV, flips."""
    img = canvas_fn(frames, src_idx[0], rects[0], offs[0], minv[0], out_hw, S)
    img = jnp.round(img)  # warpAffine rounds each pair member to uint8
    if pairs == 2:
        img2 = canvas_fn(frames, src_idx[1], rects[1], offs[1], minv[1], out_hw, S)
        img2 = jnp.round(img2)
        # host mixup: (im*r + im2*(1-r)).astype(uint8) — truncation
        img = jnp.floor(img * blend + img2 * (1.0 - blend))
    img = jnp.round(_hsv_jitter(img, hsv))
    img = jnp.where(flips[0] > 0, img[:, ::-1], img)
    img = jnp.where(flips[1] > 0, img[::-1], img)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def _render_body(img_size: int, frame_size: int, pairs: int, mode: str, dtype):
    """The un-jitted batch renderer (shared by the local and sharded jits)."""

    def render(frames, src_idx, rects, offs, minv, blend, hsv, flips):
        import functools

        n = frames.shape[0]
        if mode == "gather":
            frames_f = frames.astype(jnp.float32)
            frames_f = frames_f.reshape(n * frame_size * frame_size, 3)
            canvas_fn = _render_canvas
        else:
            frames_f = frames.astype(dtype)
            canvas_fn = functools.partial(_render_canvas_separable, dt=dtype)
        fn = lambda si, rc, of, mv, bl, hs, fl: _render_sample(
            frames_f, si, rc, of, mv, bl, hs, fl,
            (img_size, img_size), frame_size, pairs, canvas_fn,
        )
        return jax.vmap(fn)(src_idx, rects, offs, minv, blend, hsv, flips)

    return render


def make_render_fn(img_size: int, frame_size: int, pairs: int = 1,
                   mode: str = "gather", dtype=jnp.float32,
                   mesh=None, axis: str = "data"):
    """Build the jitted batch renderer.

    Args:
        img_size: output side s (square training batches).
        frame_size: source slot side S (frames padded to (S, S, 3)).
        pairs: 2 when the config enables mixup, else 1.
        mode: "gather" (any warp; bilinear taps as random gathers) or
            "separable" (axis-aligned warps only; MXU matmul renderer —
            the fast path for the reference's default hyp).
        dtype: separable-mode matmul input dtype (bfloat16 is the default
            everywhere: uint8 pixels are exact in bf16 and TPU f32 matmuls
            already multiply in bf16, so bf16 operands only drop HBM
            traffic; f32 accumulation either way). Ignored by the gather
            renderer (gather-bound; f32 taps keep it the exactness
            reference).
        mesh: optional jax.sharding.Mesh — when given, the renderer is
            compiled as one SPMD program over the mesh: source frames
            REPLICATED, every per-sample geometry input and the rendered
            batch sharded over ``axis`` (batch dim 0). Each device renders
            only its batch shard and the output is born with the train
            step's input sharding — augmentation throughput scales with
            the mesh and no post-render reshard is paid.
        axis: mesh axis name carrying the batch dimension.

    Returns render(frames, src_idx, rects, offs, minv, blend, hsv, flips)
    -> (B, s, s, 3) uint8, where frames is (N, S, S, 3) uint8 — the resident
    dataset or the streamed per-batch frames (flattened), indexed by src_idx.
    """
    if mode not in ("gather", "separable"):
        raise ValueError(f"unknown render mode {mode!r}")

    render = _render_body(img_size, frame_size, pairs, mode, dtype)
    if mesh is None:
        return jax.jit(render)

    from jax.sharding import NamedSharding, PartitionSpec as P

    def _bs(ndim):
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))

    repl = NamedSharding(mesh, P())
    # (frames, src_idx, rects, offs, minv, blend, hsv, flips)
    in_sh = (repl, _bs(3), _bs(4), _bs(4), _bs(4), _bs(1), _bs(2), _bs(2))
    return jax.jit(render, in_shardings=in_sh, out_shardings=_bs(4))


class DeviceAugmenter:
    """Trainer-side wrapper: owns the jitted renderer and (optionally) the
    device-resident source frames; turns a PlanBatch into a uint8 image batch.

    resident mode: ``frames`` (N, S, S, 3) uint8 is device_put once;
    streaming mode: each PlanBatch carries its own (B, P, 4, S, S, 3) frames.
    """

    def __init__(self, img_size: int, frame_size: int, pairs: int = 1,
                 resident_frames: Optional[np.ndarray] = None,
                 mode: str = "auto", dtype: str = "bfloat16",
                 mesh=None, axis: str = "data") -> None:
        import os

        mode = os.environ.get("AYOLO_DEVICE_AUG_MODE", mode)
        if mode not in ("auto", "gather", "separable"):
            raise ValueError(f"unknown render mode {mode!r}")
        dtype = os.environ.get("AYOLO_DEVICE_AUG_DTYPE", dtype)
        if dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown render dtype {dtype!r}")
        self.img_size = img_size
        self.frame_size = frame_size
        self.pairs = pairs
        self.mode = mode
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.mesh = mesh
        self.axis = axis
        self._render_fns: Dict[str, Any] = {}
        self._frames = None
        if resident_frames is not None:
            frames = np.ascontiguousarray(resident_frames)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._frames = jax.device_put(frames, NamedSharding(mesh, P()))
            else:
                self._frames = jax.device_put(frames)

    def _fn(self, mode: str):
        if mode not in self._render_fns:
            self._render_fns[mode] = make_render_fn(
                self.img_size, self.frame_size, self.pairs, mode,
                dtype=self.dtype, mesh=self.mesh, axis=self.axis)
        return self._render_fns[mode]

    @staticmethod
    def _batch_separable(minv) -> bool:
        """True when every plan warp in the batch is axis-aligned."""
        m = np.asarray(minv)
        return bool(
            np.all(m[..., 0, 1] == 0) and np.all(m[..., 1, 0] == 0)
            and np.all(m[..., 2, 0] == 0) and np.all(m[..., 2, 1] == 0)
        )

    def __call__(self, batch: PlanBatch):
        mode = self.mode
        if mode == "auto":
            mode = "separable" if self._batch_separable(batch.minv) else "gather"
        elif mode == "separable" and not self._batch_separable(batch.minv):
            raise ValueError(
                "separable renderer requires axis-aligned plans (hyp degrees"
                " == shear == perspective == 0); use mode='auto' or 'gather'"
            )
        if self._frames is not None:
            frames, src_idx = self._frames, batch.src_idx
        else:
            if batch.src is None:
                raise ValueError("streaming PlanBatch without src frames "
                                 "(dataset not in resident mode either)")
            b, p = batch.src.shape[:2]
            frames = batch.src.reshape(b * p * 4, self.frame_size, self.frame_size, 3)
            src_idx = np.arange(b * p * 4, dtype=np.int32).reshape(b, p, 4)
        return self._fn(mode)(
            frames, jnp.asarray(src_idx), jnp.asarray(batch.rects),
            jnp.asarray(batch.offs), jnp.asarray(batch.minv),
            jnp.asarray(batch.blend), jnp.asarray(batch.hsv),
            jnp.asarray(batch.flips),
        )

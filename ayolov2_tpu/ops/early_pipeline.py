"""Fused early-network Pallas pipeline: stem -> conv1 -> C3_1 -> conv2.

The serving graph's worst region is its first four layers. The cin=3 stem
runs at ~2% MXU utilization under XLA (K=cin on the contraction) and costs
5.4 ms of the 14.6 ms bs32@640 yolov5s serve graph; every *standalone* stem
replacement measured in rounds 1-2 (channel-major Pallas, space-to-depth,
im2col) lost end-to-end because the materialized intermediate broke XLA's
stem/downstream overlap (STATUS.md perf post-mortem). This kernel removes
the boundary instead: one pallas_call computes

    stem  (6x6/s2 as space-to-depth + 3x3) -> 320-level, c0 channels
    conv1 (3x3/s2)                          -> 160-level, c1
    C3_1  (cv1/cv2 1x1, n bottlenecks, cv3) -> 160-level, c1
    conv2 (3x3/s2)                          -> 80-level,  c2

entirely in VMEM, emitting the first layout-clean activation of the
network: (bs, H/8, W/8, c2) NHWC bf16 (c2 = 128 for yolov5s — full-lane),
which XLA continues from at native efficiency. No intermediate ever
touches HBM, so the 25%-full-lane padded writes that floor every other
approach never happen.

Design (TPU-first; the reference runs these layers as four cuDNN calls,
scripts/model/yolo_model.py forward — nothing here translates that):

  * Full polyphase layout. Every stride-2 is pre-absorbed by storing each
    level phase-split relative to the FINAL /8 grid: the space-to-depth
    input planes and the stem output carry 4 phase blocks (320-col mod 4),
    the 160-level tensors carry 2 parity blocks (160-col mod 2), the
    output is plain. Consequence: every conv tap at every layer is a
    *stride-1* lane slice of some phase block — no strided gathers, no
    lane-space deinterleaves, anywhere.
  * Row slabs. A level-L tensor is a VMEM scratch (rows, cin, lanes) whose
    per-row slab (cin, lanes) has channels in sublanes and the phase
    blocks side by side in lanes. Row strides (the other half of each
    stride-2) are plain dynamic row indices (slab[2v + i]).
  * Each conv row = one matmul dot(W^T (co, K), patch (K, lanes)) with the
    patch assembled from contiguous (cin, width) block copies; K rows
    beyond the true K are zero in the *weights*, so stale patch scratch
    contributes exact zeros and is never cleared. fp32 accumulation,
    bias + SiLU in bf16 (matches the XLA fused-conv path numerics).
  * Same-level 3x3 taps use a circular jnp.roll (two slices + concat in
    Mosaic) whose wrapped lanes land only in the halo margins; every
    block carries enough halo that margin garbage never reaches a lane
    the next layer keeps. Margins are sized by the C3 depth n.
  * XLA-side prep (`_prep_strips`) pads the uint8 image, performs the
    phase split, and stacks overlapping row-strips so the kernel's grid
    uses plain non-overlapping BlockSpecs -> Pallas auto-pipelines the
    HBM->VMEM strip DMA against compute. /255 is folded into the stem
    weights, so the kernel consumes raw uint8 pixels.

Supported: the fused (BN-folded) serving path of models whose first four
layers are Conv(k6,s2) / Conv(k3,s2) / C3(n>=1, shortcut) / Conv(k3,s2) —
the YOLOv5-v6 family (s/m/l/x differ only in widths c0/c1/c2 and depth n).
Training/backward is out of scope (the train path keeps XLA).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class EarlyParams(NamedTuple):
    """Matmul-ready weights (all bf16). W: (co, K_pad) with rows past the
    true K zeroed (kills stale patch-scratch rows); b: (co, 1) for
    sublane-dim broadcast. n = C3 bottleneck count."""

    w_stem: jax.Array               # (c0, 112)  K = 108 = 3x3 x 12 planes
    b_stem: jax.Array               # (c0, 1)
    w_c1: jax.Array                 # (c1, 9*c0)
    b_c1: jax.Array
    w_cv1: jax.Array                # (ch, c1)
    b_cv1: jax.Array
    w_m_cv1: Tuple[jax.Array, ...]  # n x (ch, ch)
    b_m_cv1: Tuple[jax.Array, ...]
    w_m_cv2: Tuple[jax.Array, ...]  # n x (ch, 9*ch)
    b_m_cv2: Tuple[jax.Array, ...]
    w_cv2: jax.Array                # (ch, c1)
    b_cv2: jax.Array
    w_cv3: jax.Array                # (c1, 2*ch)
    b_cv3: jax.Array
    w_c2: jax.Array                 # (c2, 9*c1)
    b_c2: jax.Array

    @property
    def c0(self):
        return self.w_stem.shape[0]

    @property
    def c1(self):
        return self.w_c1.shape[0]

    @property
    def ch(self):
        return self.w_cv1.shape[0]

    @property
    def c2(self):
        return self.w_c2.shape[0]

    @property
    def n(self):
        return len(self.w_m_cv1)


def can_fuse_early(specs) -> bool:
    """True when the first 4 specs match the YOLOv5-v6 early pattern and
    none of them feeds a skip connection."""
    if len(specs) < 5:
        return False
    s0, s1, s2, s3 = specs[0], specs[1], specs[2], specs[3]

    def conv_ks(s):
        a = s.args
        return (a[1] if len(a) > 1 else 1), (a[2] if len(a) > 2 else 1)

    ok = (
        s0.module == "Conv" and conv_ks(s0) == (6, 2)
        and s1.module == "Conv" and conv_ks(s1) == (3, 2)
        and s2.module == "C3" and (len(s2.args) < 2 or bool(s2.args[1]))
        and s3.module == "Conv" and conv_ks(s3) == (3, 2)
        and all(f == -1 for s in (s1, s2, s3) for f in s.from_idx)
    )
    return ok


def _wk(kernel, bias, k_pad=None):
    """(kh, kw, cin, co) HWIO fused kernel -> ((co, K_pad), (co, 1)) bf16.

    Patch row order is (kh, kw, cin) — must match the kernel's assembly
    loops. Rows past the true K are zero (see module docstring)."""
    kh, kw, cin, co = kernel.shape
    k_true = kh * kw * cin
    w = kernel.reshape(k_true, co).T
    if k_pad is None:
        k_pad = _rup(k_true, 16)
    w = jnp.pad(w, ((0, 0), (0, k_pad - k_true)))
    return w.astype(jnp.bfloat16), bias.reshape(co, 1).astype(jnp.bfloat16)


def extract_early_params(fused_variables: Dict[str, Any]) -> EarlyParams:
    """Pull layers 0..3 from a fused (BN-folded) tree: model_0/conv,
    model_1/conv, model_2/{cv1,cv2,cv3,m*}/conv, model_3/conv. /255 is
    folded into the stem weights (kernel input is raw uint8)."""
    p = fused_variables["params"]
    k0 = p["model_0"]["conv"]["kernel"]  # (6, 6, cin, c0)
    cin, c0 = k0.shape[2], k0.shape[3]
    # space-to-depth rearrangement (models/layers._S2DConv 'reshape' mode):
    # K'[a, b, (p, q, c), o] = K[2a+p, 2b+q, c, o] — 3x3 over 4*cin planes,
    # plane index m = p*2*cin + q*cin + c (p-major), matching _prep_strips.
    k0 = k0.reshape(3, 2, 3, 2, cin, c0).transpose(0, 2, 1, 3, 4, 5)
    k0 = k0.reshape(3, 3, 4 * cin, c0) / 255.0
    w_stem, b_stem = _wk(k0, p["model_0"]["conv"]["bias"])
    w_c1, b_c1 = _wk(p["model_1"]["conv"]["kernel"], p["model_1"]["conv"]["bias"])
    c3 = p["model_2"]
    # 1x1 convs consume the level scratch directly (no patch) — their K must
    # equal the true input channel count, so pass k_pad=k_true (no pad)
    cv1k = c3["cv1"]["conv"]["kernel"]
    w_cv1, b_cv1 = _wk(cv1k, c3["cv1"]["conv"]["bias"], k_pad=cv1k.shape[2])
    cv2k = c3["cv2"]["conv"]["kernel"]
    w_cv2, b_cv2 = _wk(cv2k, c3["cv2"]["conv"]["bias"], k_pad=cv2k.shape[2])
    w_cv3, b_cv3 = _wk(c3["cv3"]["conv"]["kernel"], c3["cv3"]["conv"]["bias"])
    wm1, bm1, wm2, bm2 = [], [], [], []
    for i in range(64):
        if f"m{i}" not in c3:
            break
        m = c3[f"m{i}"]
        m1k = m["cv1"]["conv"]["kernel"]
        w, b = _wk(m1k, m["cv1"]["conv"]["bias"], k_pad=m1k.shape[2])
        wm1.append(w)
        bm1.append(b)
        w, b = _wk(m["cv2"]["conv"]["kernel"], m["cv2"]["conv"]["bias"])
        wm2.append(w)
        bm2.append(b)
    w_c2, b_c2 = _wk(p["model_3"]["conv"]["kernel"], p["model_3"]["conv"]["bias"])
    return EarlyParams(
        w_stem, b_stem, w_c1, b_c1, w_cv1, b_cv1,
        tuple(wm1), tuple(bm1), tuple(wm2), tuple(bm2),
        w_cv2, b_cv2, w_cv3, b_cv3, w_c2, b_c2,
    )


# --- geometry ---------------------------------------------------------------
# SH = strip height in /8-level rows; n = C3 depth; w80 = W/8.  Verified
# against the flax model by tests/test_early_pipeline.py.
#
# Rows (exact, no garbage): strip a covers, with per-strip local indices,
#   conv2 out  /8-rows  z in [0, SH)       <-> 80-r  = z + SH*a
#   C3 out     160-rows t in [0, R3)       <-> 160-r = t + 2*SH*a - 1
#   conv1/m    160-rows v in [0, R1)       <-> 160-r = v + 2*SH*a - n - 1
#   stem out   320-rows o in [0, R0)       <-> 320-r = o + 4*SH*a - 2n - 3
#   s2d planes 320-rows u in [0, RS)       <-> 320-r = u + 4*SH*a - 2n - 4
#   R3 = 2*SH + 1;  R1 = 2*SH + 2n + 1;  R0 = 2*R1 + 1;  RS = R0 + 2
#   maps: conv2 z <- c3[2z + i];  c3 t <- m/c1 row [t + n];
#         bottleneck row t <- [t - 1 + i];  conv1 v <- stem [2v + i];
#         stem o <- s2d [o + i]                    (i = 0..2 row taps)
#
# Lanes (phase blocks side by side; halo margins absorb edge garbage):
#   KH  = n + 2                 160-level halo
#   s2d/stem blocks: 4 (320-col mod 4); 160-level blocks: 2 (160-col mod 2)
#   CQ  = w80 + 2*(KH+2) + 2    s2d per-block width,  k0 at lane KH+3
#   CP0 = w80 + 2*(KH+1) + 2    stem per-block width, k0 at lane KH+2
#   CP1 = w80 + 2*KH + 2        160 per-block width,  k0 at lane KH+1
#   tap of phase m: block m mod P, k-shift m // P; all cross-level taps are
#   in-bounds plain slices (src start = block*W + 1 + shift); same-level
#   3x3 taps roll circularly (wrap lands in margins only).


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _make_kernel(SH: int, w80: int, h80: int, n: int, cs: Dict[str, int],
                 stages: Tuple[str, ...]):
    R3, R1, R0, RS = cs["R3"], cs["R1"], cs["R0"], cs["RS"]
    CQ, CP0, CP1, KH = cs["CQ"], cs["CP0"], cs["CP1"], cs["KH"]

    def _edge_mask(n_rows, n_blocks, width, lo, hi, row_ok):
        """Zero out-of-image lanes/rows: the reference zero-pads each conv
        at *its own* input level; a fused chain must re-zero the padding
        region before every 3x3 consumes it (silu(bias) != 0). Built at
        full sublane height — Mosaic can't relayout a (1, N) i1 vector."""
        # int32 clip arithmetic, no i1 vectors: this Mosaic build cannot
        # relayout i1 vectors whose sublane dim is replicated (iota varies
        # only along lanes), so comparisons/& are off the table.
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_blocks * width), 1)
        d = jax.lax.rem(lane, width)
        inside = jnp.clip(d - (lo - 1), 0, 1) * jnp.clip(hi - d, 0, 1)
        row = jnp.where(row_ok, 1, 0)  # scalar select — lowers to sreg
        return (inside * row).astype(jnp.float32).astype(jnp.bfloat16)

    def kernel(s_ref, *args):
        nw = 6 + 4 * n + 6
        (w_stem, b_stem, w_c1, b_c1, w_cv1, b_cv1, *rest) = args[:nw]
        wm1 = rest[0 : 2 * n : 2]
        bm1 = rest[1 : 2 * n : 2]
        wm2 = rest[2 * n : 4 * n : 2]
        bm2 = rest[2 * n + 1 : 4 * n : 2]
        w_cv2, b_cv2, w_cv3, b_cv3, w_c2, b_c2 = rest[4 * n :]
        out_ref = args[nw]
        sbf, stem_o, c1_o, m_a, m_b, c3_o, patch = args[nw + 1 :]

        # Mosaic has no direct uint8->bf16 cast; chain through int32/f32
        # (the uint8 HBM->VMEM DMA at half the bf16 bytes is worth it).
        sbf[...] = s_ref[0, 0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        c12 = sbf.shape[1]   # 4*cin s2d planes (12)
        c0 = w_stem.shape[0]
        c1 = w_c1.shape[0]
        ch = w_cv1.shape[0]

        # Zero every conv's K-pad patch rows: stale-but-finite scratch is
        # cancelled by the zero weight rows, but NEVER-written scratch can
        # hold NaN bit patterns (0 * NaN = NaN) — so the pad rows that the
        # assembly loops skip must actually be zero.
        pad_rows = set()
        for w, k_true in (
            (w_stem, 9 * c12), (w_c1, 9 * c0), (w_cv3, 2 * ch),
            (w_c2, 9 * c1),
        ) + tuple((wm2[i], 9 * ch) for i in range(n)):
            if w.shape[1] > k_true:
                pad_rows.add((k_true, w.shape[1]))
        for lo, hi in sorted(pad_rows):
            patch[pl.ds(lo, hi - lo), :] = jnp.zeros(
                (hi - lo, patch.shape[1]), jnp.bfloat16
            )

        def matmul(w, b, k_true, n_lanes):
            out = jax.lax.dot_general(
                w, patch[: w.shape[1], :n_lanes],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # bias+SiLU in f32: Mosaic mis-lowers bf16 logistic (f32
            # constant broadcast into a bf16 vector fails verification)
            return _silu(out + b[...].astype(jnp.float32)).astype(jnp.bfloat16)

        # ---- stem: 3x3 over the 12 phase planes, 4 output phase blocks --
        def stem_row(o, carry):
            for i in range(3):
                slab = sbf[o + i]                      # (12, 4*CQ)
                for jj in range(3):
                    base = (i * 3 + jj) * c12
                    for phi in range(4):
                        m = phi - 1 + jj
                        src = (m % 4) * CQ + 1 + (m // 4)
                        patch[pl.ds(base, c12), pl.ds(phi * CP0, CP0)] = (
                            jax.lax.slice_in_dim(slab, src, src + CP0, axis=1)
                        )
            og = o + 4 * SH * pl.program_id(1) - (2 * n + 3)
            mask = _edge_mask(c0, 4, CP0, KH + 2, KH + 2 + w80,
                              (og >= 0) & (og < 4 * h80))
            stem_o[o] = matmul(w_stem[...], b_stem, 9 * c12, 4 * CP0) * mask
            return carry

        if "stem" in stages:
            jax.lax.fori_loop(0, R0, stem_row, 0)

        # ---- conv1: 3x3 stride 2 (rows via 2v+i, cols via phase blocks) -
        def c1_row(v, carry):
            for i in range(3):
                slab = stem_o[2 * v + i]               # (c0, 4*CP0)
                for jj in range(3):
                    base = (i * 3 + jj) * c0
                    for r in range(2):
                        m = 2 * r + jj - 1
                        src = (m % 4) * CP0 + 1 + (m // 4)
                        patch[pl.ds(base, c0), pl.ds(r * CP1, CP1)] = (
                            jax.lax.slice_in_dim(slab, src, src + CP1, axis=1)
                        )
            c1_o[v] = matmul(w_c1[...], b_c1, 9 * c0, 2 * CP1)
            return carry

        if "c1" in stages:
            jax.lax.fori_loop(0, R1, c1_row, 0)

        # ---- C3 left: cv1 1x1, then n bottlenecks (1x1 + 3x3 + residual)
        def cv1_row(v, carry):
            y = jax.lax.dot_general(
                w_cv1[...], c1_o[v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_a[v] = _silu(y + b_cv1[...].astype(jnp.float32)).astype(jnp.bfloat16)
            return carry

        if "cv1" in stages:
            jax.lax.fori_loop(0, R1, cv1_row, 0)

        for ib in range(n if "m" in stages else 0):
            def m1_row(v, carry, ib=ib):
                y = jax.lax.dot_general(
                    wm1[ib][...], m_a[v],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                vg = v + 2 * SH * pl.program_id(1) - (n + 1)
                mask = _edge_mask(ch, 2, CP1, KH + 1, KH + 1 + w80,
                                  (vg >= 0) & (vg < 2 * h80))
                m_b[v] = _silu(y + bm1[ib][...].astype(jnp.float32)).astype(jnp.bfloat16) * mask
                return carry

            jax.lax.fori_loop(ib, R1 - ib, m1_row, 0)

            def m2_row(t, carry, ib=ib):
                for i in range(3):
                    slab = m_b[t - 1 + i]              # (ch, 2*CP1)
                    for jj in range(3):
                        base = (i * 3 + jj) * ch
                        for r in range(2):
                            m = r + jj - 1
                            s = (m % 2) * CP1 + (m // 2)
                            # same-level tap: circular shift, wrap lands in
                            # the halo margin only (s is static; jnp.roll
                            # with shift 0 lowers to a zero-size slice that
                            # Mosaic rejects — skip the roll)
                            rolled = slab if s == 0 else jnp.roll(slab, -s, axis=1)
                            patch[pl.ds(base, ch), pl.ds(r * CP1, CP1)] = (
                                jax.lax.slice_in_dim(rolled, 0, CP1, axis=1)
                            )
                m_a[t] = m_a[t] + matmul(wm2[ib][...], bm2[ib], 9 * ch, 2 * CP1)
                return carry

            jax.lax.fori_loop(ib + 1, R1 - ib - 1, m2_row, 0)

        # ---- C3 tail: cv2 branch (1x1 on conv1-out), concat, cv3 (1x1) --
        def c3_row(t, carry):
            y = jax.lax.dot_general(
                w_cv2[...], c1_o[t + n],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = _silu(y + b_cv2[...].astype(jnp.float32)).astype(jnp.bfloat16)
            patch[pl.ds(0, ch), pl.ds(0, 2 * CP1)] = m_a[t + n]
            patch[pl.ds(ch, ch), pl.ds(0, 2 * CP1)] = y
            tg = t + 2 * SH * pl.program_id(1) - 1
            mask = _edge_mask(c1, 2, CP1, KH + 1, KH + 1 + w80,
                              (tg >= 0) & (tg < 2 * h80))
            c3_o[t] = matmul(w_cv3[...], b_cv3, 2 * ch, 2 * CP1) * mask
            return carry

        if "c3" in stages:
            jax.lax.fori_loop(0, R3, c3_row, 0)

        # ---- conv2: 3x3 stride 2 -> (SH, w80, c2) NHWC rows -------------
        def c2_row(z, carry):
            for i in range(3):
                slab = c3_o[2 * z + i]                 # (c1, 2*CP1)
                for jj in range(3):
                    m = jj - 1
                    src = (m % 2) * CP1 + KH + 1 + (m // 2)
                    patch[pl.ds((i * 3 + jj) * c1, c1), pl.ds(0, w80)] = (
                        jax.lax.slice_in_dim(slab, src, src + w80, axis=1)
                    )
            y = matmul(w_c2[...], b_c2, 9 * c1, w80)   # (c2, w80)
            out_ref[0, z] = y.T
            return carry

        if "c2" in stages:
            jax.lax.fori_loop(0, SH, c2_row, 0)
        else:  # timing diagnostics only — output is zeros
            out_ref[0, 0] = jnp.zeros(out_ref.shape[2:], jnp.bfloat16)

    return kernel


def _geometry(SH: int, w80: int, n: int) -> Dict[str, int]:
    KH = n + 2
    return dict(
        R3=2 * SH + 1,
        R1=2 * SH + 2 * n + 1,
        R0=4 * SH + 4 * n + 3,
        RS=4 * SH + 4 * n + 5,
        KH=KH,
        CQ=w80 + 2 * (KH + 2) + 2,
        CP0=w80 + 2 * (KH + 1) + 2,
        CP1=w80 + 2 * KH + 2,
    )


def _prep_strips(images: jax.Array, SH: int, n: int) -> jax.Array:
    """(bs, H, W, cin) uint8 -> (bs, S, RS, 4*cin, 4*CQ) uint8 phase strips.

    Pure XLA on uint8: pad, split 640-col into (k, psi, q) phases and
    640-row pairs into (row, p), stack overlapping row strips. ~10-15%
    extra HBM traffic vs the raw image buys plain non-overlapping
    BlockSpecs (auto-pipelined strip DMA) and a stride-free kernel."""
    bs, h, w, cin = images.shape
    cs = _geometry(SH, w // 8, n)
    RS, CQ = cs["RS"], cs["CQ"]
    n_strips = (h // 8) // SH
    # rows: 320-coords [-(2n+4), h/2 + 2n + 4] -> 640 pad top 4n+8, bottom
    # 4n+10; cols: per-block k in [-(KH+3), w80 + KH + 3) -> 320-cols
    # [-4*(KH+3), 4*(w80+KH+3)+3] -> 640 pad 8*(KH+3) each side.
    pc = 8 * (cs["KH"] + 3)
    x = jnp.pad(images, ((0, 0), (4 * n + 8, 4 * n + 10), (pc, pc), (0, 0)))
    hp, wp = h + 8 * n + 18, w + 2 * pc
    # (bs, hp/2, p, | wp/8 k, 4 psi, 2 q |, cin) -> planes (p, q, c),
    # lanes (psi, k)
    x = x.reshape(bs, hp // 2, 2, wp // 8, 4, 2, cin)
    x = x.transpose(0, 1, 2, 5, 6, 4, 3)  # (bs, hp2, p, q, c, psi, k)
    x = x.reshape(bs, hp // 2, 4 * cin, 4 * (wp // 8))
    assert wp // 8 == CQ, (wp // 8, CQ)
    strips = [x[:, 4 * SH * a : 4 * SH * a + RS] for a in range(n_strips)]
    return jnp.stack(strips, axis=1)


ALL_STAGES = ("stem", "c1", "cv1", "m", "c3", "c2")


@functools.partial(jax.jit, static_argnames=("strip_h", "interpret", "stages"))
def early_pipeline(
    images: jax.Array,
    ep: EarlyParams,
    *,
    strip_h: int = 10,
    interpret: bool = False,
    stages: Tuple[str, ...] = ALL_STAGES,
) -> jax.Array:
    """Fused stem/conv1/C3/conv2. images: (bs, H, W, 3) uint8, raw pixels
    (the /255 lives in ep.w_stem). Returns (bs, H/8, W/8, c2) bf16."""
    bs, h, w, _ = images.shape
    SH = strip_h
    if (h // 8) % SH or h % 8 or w % 8:
        raise ValueError(f"image {h}x{w} incompatible with strip_h={SH}")
    w80, h80 = w // 8, h // 8
    n, c0, c1, ch, c2 = ep.n, ep.c0, ep.c1, ep.ch, ep.c2
    cs = _geometry(SH, w80, n)
    R3, R1, R0, RS = cs["R3"], cs["R1"], cs["R0"], cs["RS"]
    CQ, CP0, CP1 = cs["CQ"], cs["CP0"], cs["CP1"]
    strips = _prep_strips(images, SH, n)

    weights = [ep.w_stem, ep.b_stem, ep.w_c1, ep.b_c1, ep.w_cv1, ep.b_cv1]
    for i in range(n):
        weights += [ep.w_m_cv1[i], ep.b_m_cv1[i]]
    for i in range(n):
        weights += [ep.w_m_cv2[i], ep.b_m_cv2[i]]
    weights += [ep.w_cv2, ep.b_cv2, ep.w_cv3, ep.b_cv3, ep.w_c2, ep.b_c2]

    w_specs = [
        pl.BlockSpec(w.shape, lambda b, s, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kmax = max(9 * 4 * images.shape[-1], 9 * c0, 9 * c1, 9 * ch, 2 * ch, c1)
    lmax = max(4 * CP0, 2 * CP1, 4 * CQ)

    out = pl.pallas_call(
        _make_kernel(SH, w80, h80, n, cs, stages),
        grid=(bs, h80 // SH),
        in_specs=[
            pl.BlockSpec((1, 1, RS, 4 * images.shape[-1], 4 * CQ),
                         lambda b, s: (b, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, SH, w80, c2), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, h80, w80, c2), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((RS, 4 * images.shape[-1], 4 * CQ), jnp.bfloat16),
            pltpu.VMEM((R0, c0, 4 * CP0), jnp.bfloat16),   # stem_o
            pltpu.VMEM((R1, c1, 2 * CP1), jnp.bfloat16),   # c1_o
            pltpu.VMEM((R1, ch, 2 * CP1), jnp.bfloat16),   # m_a
            pltpu.VMEM((R1, ch, 2 * CP1), jnp.bfloat16),   # m_b
            pltpu.VMEM((R3, c1, 2 * CP1), jnp.bfloat16),   # c3_o
            pltpu.VMEM((_rup(kmax, 16), _rup(lmax, 128)), jnp.bfloat16),
        ],
        # the Mosaic TPU interpreter (not the HLO one) — it implements
        # program_id and mirrors real TPU buffer semantics on CPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(strips, *weights)
    return out

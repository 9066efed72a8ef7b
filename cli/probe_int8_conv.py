"""int8-vs-bf16 conv micro-probe — the evidence behind STATUS.md's int8 verdict.

Measures, on the ambient device (run on the real TPU for the recorded
numbers), a representative mid-network conv (3x3, cin=cout=256 @ 80x80,
bs32) in three forms:

  1. bf16 x bf16 -> f32 conv (the serving default)
  2. pure s8 x s8 -> s32 conv (the nominal 2x-MXU-rate path)
  3. the full PTQ chain: f32 -> quantize (round/clip to s8) -> s8 conv ->
     dequantize (the per-layer cost an int8 serving graph actually pays)

Result recorded 2026-08-18 on the v5e (runs/bench_matrix/int8_probe.json):
the pure s8 conv is SLOWER than bf16 through this XLA toolchain, so int8
PTQ is a deployment-format feature here, not a throughput feature.

Reference analogue: TensorRT int8 engine build (model_converter.py:147-260).

Usage: python cli/probe_int8_conv.py [--out runs/bench_matrix/int8_probe.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()


def _hard_time(fn, sync, iters=20):
    for _ in range(3):
        sync(fn())
    t0 = time.perf_counter()
    sync(fn())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for _ in range(iters + 1):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0 - t1) / iters


def main() -> int:
    p = argparse.ArgumentParser(description="int8 vs bf16 conv micro-probe")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--hw", type=int, default=80)
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--kernel", type=int, default=3)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    b, hw, c, k = args.batch, args.hw, args.channels, args.kernel
    x_f = jnp.asarray(rng.normal(size=(b, hw, hw, c)).astype(np.float32))
    w_f = jnp.asarray(rng.normal(size=(k, k, c, c)).astype(np.float32) * 0.05)
    x_s8 = jnp.asarray(rng.integers(-127, 127, (b, hw, hw, c), dtype=np.int8))
    w_s8 = jnp.asarray(rng.integers(-127, 127, (k, k, c, c), dtype=np.int8))
    dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, out_dtype):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=out_dtype,
        )

    bf16 = jax.jit(lambda x, w: conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), jnp.float32))
    s8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))

    @jax.jit
    def ptq_chain(x, w_q, x_scale, w_scale):
        # the per-layer cost an int8 serving graph pays: activation
        # round/clip to s8, integer conv, rescale back to float
        xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
        acc = conv(xq, w_q, jnp.int32)
        return acc.astype(jnp.float32) * (x_scale * w_scale)

    sync = lambda r: float(jnp.asarray(r).sum())
    rows = []

    def emit(name, t):
        row = {"metric": name, "ms": round(t * 1e3, 2),
               "shape": f"{k}x{k} cin=cout={c} @ {hw}x{hw} bs{b}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    emit("conv_bf16xbf16_f32acc", _hard_time(lambda: bf16(x_f, w_f), sync, args.iters))
    emit("conv_s8xs8_s32acc", _hard_time(lambda: s8(x_s8, w_s8), sync, args.iters))
    emit("conv_ptq_chain_quant_conv_dequant",
         _hard_time(lambda: ptq_chain(x_f, w_s8, jnp.float32(0.05), jnp.float32(0.01)),
                    sync, args.iters))

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({
            "device": jax.devices()[0].platform, "rows": rows}, indent=1))
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

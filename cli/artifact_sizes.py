"""Regenerate runs/bench_matrix/artifact_sizes.json — export-artifact size
evidence for the STATUS/int8 deployment-size claims.

Exports the fixture-trained yolov5s (nc=20, 320px, bs1) serving graph from a
training checkpoint in three weight formats and records the byte sizes:

  fp32        — plain export
  bf16_baked  — half=True: weight constants stored bf16 in the artifact
                (bit-identical outputs, tests/test_export.py)
  int8        — compress/quantize PTQ artifact (s8 conv weight constants)

Reference analogue: the TRT engine fp16/int8 artifact sizes produced by
model_converter.py:195-266 (fp16/int8 builder flags).

Usage: python cli/artifact_sizes.py [--ckpt runs/.../best.ckpt] [--out ...]
Runs fine on CPU (JAX_PLATFORMS=cpu) — sizes don't depend on the backend.
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

# force CPU before any jax import side effects — the ambient sitecustomize
# pins the tunneled TPU and plain `env JAX_PLATFORMS=cpu` is not enough in
# subprocesses (CLAUDE.md); artifact sizes don't depend on the backend
import os  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

DEFAULT_CKPT = "runs/golden_r4_mem/train/2026_0818_runs/weights/best.ckpt"
MODEL_CFG = "res/configs/model/yolov5s.yaml"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", default=DEFAULT_CKPT)
    p.add_argument("--model-cfg", default=MODEL_CFG)
    p.add_argument("--img-size", type=int, default=320)
    p.add_argument("--nc", type=int, default=20)
    p.add_argument("--out", default="runs/bench_matrix/artifact_sizes.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ayolov2_tpu.compress.quantize import quantize_model
    from ayolov2_tpu.export.exporter import export_serving
    from ayolov2_tpu.models import build_model, fuse_params
    from ayolov2_tpu.utils.checkpoint import load_variables

    variables, _meta = load_variables(args.ckpt, model_cfg=args.model_cfg, nc=args.nc)
    fused = fuse_params(variables)
    hw = (args.img_size, args.img_size)

    import tempfile

    sizes = {}
    with tempfile.TemporaryDirectory() as td:
        for key, kw in (
            ("fp32", dict(half=False)),
            ("bf16_baked", dict(half=True)),
        ):
            paths = export_serving(
                args.model_cfg, fused, str(Path(td) / key), batch_size=1,
                img_size=hw, nc=args.nc, **kw,
            )
            sizes[key] = {
                "jaxexp": Path(paths["jaxexp"]).stat().st_size,
                "stablehlo": Path(paths["stablehlo"]).stat().st_size,
            }
            print(f"{key}: {sizes[key]}", flush=True)

        # int8 PTQ — calibration content doesn't change the artifact size;
        # one synthetic batch keeps this script dataset-free
        rng = np.random.default_rng(0)
        calib = [jnp.asarray(
            rng.integers(0, 255, (1, *hw, 3), np.uint8).astype(np.float32) / 255.0,
            jnp.bfloat16,
        )]
        _qmodel, qvars = quantize_model(args.model_cfg, fused, calib, nc=args.nc)
        paths = export_serving(
            args.model_cfg, qvars, str(Path(td) / "int8"), batch_size=1,
            img_size=hw, nc=args.nc, quant=True, half=True,
        )
        sizes["int8"] = {
            "jaxexp": Path(paths["jaxexp"]).stat().st_size,
            "stablehlo": Path(paths["stablehlo"]).stat().st_size,
        }
        print(f"int8: {sizes['int8']}", flush=True)

    f32, b16, i8 = (sizes[k]["jaxexp"] for k in ("fp32", "bf16_baked", "int8"))
    out = {
        "note": (
            "Export artifact sizes (bytes) for the fixture-trained yolov5s "
            f"(nc={args.nc}, {args.img_size}px, bs1), generated "
            f"{time.strftime('%Y-%m-%d')} by cli/artifact_sizes.py from "
            f"{args.ckpt}. bf16 is the post-weight-baking number (weight "
            "constants stored bf16; bit-identical outputs, tests/test_export"
            ".py::test_export_half_bakes_bf16_weights). int8 = "
            "compress/quantize PTQ artifact (s8 conv weight constants)."
        ),
        **sizes,
        "ratios": {
            "int8_vs_fp32": round(f32 / i8, 2),
            "int8_vs_bf16": round(b16 / i8, 2),
            "bf16_vs_fp32": round(f32 / b16, 2),
        },
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

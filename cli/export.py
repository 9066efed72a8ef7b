"""Export a trained model to an AOT serving artifact.

Parity target: /root/reference/export.py:101-194 — load ckpt (ema|model),
optional rebuild from a model config with weight transfer, export, dry run,
write sidecar ``{model}_{type}.yaml`` that overrides CLI args at val time.

TPU deltas: the artifact is a jax.export StableHLO program (with the NMS
baked in like the TRT BatchedNMS graph surgery); dry run executes the
deserialized artifact and checks it against the live jit.

Usage:
    python cli/export.py --weights best.ckpt --type tpu_nms -iw 640 --batch-size 32
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

import jax
import numpy as np

from ayolov2_tpu.export import export_serving, load_exported
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.utils.checkpoint import load_variables
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("export")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Export model (export.py parity).")
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--model-cfg", type=str, default="",
                        help="rebuild under this config with weight transfer")
    parser.add_argument("--type", type=str, default="tpu_nms",
                        choices=["tpu_nms", "tpu_raw"],
                        help="tpu_nms = boxes-out (TRT parity); tpu_raw = decoded predictions")
    parser.add_argument("--nc", type=int, default=80)
    parser.add_argument("-iw", "--img-width", type=int, default=640)
    parser.add_argument("-ih", "--img-height", type=int, default=-1)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("-ct", "--conf-t", type=float, default=0.001)
    parser.add_argument("-it", "--iou-t", type=float, default=0.65)
    parser.add_argument("--top-k", type=int, default=512)
    parser.add_argument("-ktk", "--keep-top-k", type=int, default=100)
    parser.add_argument("--no-half", action="store_true")
    parser.add_argument("--platforms", type=str, default="", help="comma list, e.g. cpu,tpu")
    parser.add_argument("--no-dry-run", action="store_true")
    parser.add_argument("--out", type=str, default="")
    parser.add_argument("--dst", type=str, default="",
                        help="export directory (reference --dst); default next to the ckpt")
    parser.add_argument("--dtype", type=str, default="fp16", choices=["fp16", "int8", "fp32"],
                        help="reference --dtype: fp16 maps to bf16 here (MXU native); "
                             "fp32 = --no-half; int8 = post-training-quantized int8 "
                             "convs (the TRT int8-engine analogue) — needs --calib-dir")
    parser.add_argument("--calib-dir", type=str, default="",
                        help="image folder for int8 calibration (extra vs reference: "
                             "upstream export.py passes no calibrator so its int8 "
                             "path falls back to float, model_converter.py:204-206; "
                             "without this flag we match that fallback)")
    parser.add_argument("--calib-batches", type=int, default=8,
                        help="number of calibration batches (int8 only)")
    parser.add_argument("--calib-method", type=str, default="absmax",
                        choices=["absmax", "p999"],
                        help="int8 input-range calibration: full absmax "
                             "(default; measured better, see STATUS.md) or "
                             "99.9th-percentile clipping")
    parser.add_argument("--rect", action="store_true", dest="rect", default=True,
                        help="reference parity: exported graphs are fixed-shape; "
                             "rect affects only the val-side loader")
    parser.add_argument("--no-rect", action="store_false", dest="rect")
    parser.add_argument("--opset", type=int, default=11,
                        help="reference-CLI parity (ONNX opset); StableHLO export "
                             "has no opset — value is logged only")
    parser.add_argument("--gpu-mem", type=int, default=6,
                        help="reference-CLI parity (TensorRT workspace GiB); logged only")
    parser.add_argument("--raw-hw", "--raw_hw", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="export the raw-frame variant: input is native "
                             "HxW uint8 frames, letterbox runs IN-GRAPH and "
                             "detections return in raw coordinates — the C++ "
                             "PJRT runner then needs zero host cv2 (beyond "
                             "the reference: its TRT engine still letterboxes "
                             "on host, train_utils.py:262-283)")
    parser.add_argument("--verbose", type=int, nargs="?", const=1, default=1)
    return parser


def main() -> None:
    args = get_parser().parse_args()
    if args.img_height < 0:
        args.img_height = args.img_width
    if args.dtype == "fp32":
        args.no_half = True
    elif args.dtype == "int8" and not args.calib_dir:
        # reference behavior: int8 without a calibrator falls back to float
        # (scripts/model_converter/model_converter.py:204-206)
        LOGGER.warning("INT8 calibrator must be provided. Switching to float precision.")
        args.dtype = "fp16"

    variables, meta = load_variables(args.weights, prefer_ema=True, model_cfg=args.model_cfg,
                                     nc=args.nc)
    model_cfg = json.loads(meta["model_cfg"]) if meta.get("model_cfg") else None
    if args.model_cfg:
        new_cfg = parse_model_config(args.model_cfg)
        if model_cfg and json.dumps(new_cfg, sort_keys=True) != json.dumps(model_cfg, sort_keys=True):
            LOGGER.info("rebuilding under %s with weight transfer", args.model_cfg)
        model_cfg = new_cfg
    assert model_cfg, "need --model-cfg or a checkpoint with embedded model config"
    decompose_map = json.loads(meta["decompose_map"]) if meta.get("decompose_map") else ()

    quant = args.dtype == "int8"
    if quant:
        import jax.numpy as jnp

        from ayolov2_tpu.compress.quantize import quantize_model
        from ayolov2_tpu.data.datasets import ImageFolderDataset

        dtype = jnp.float32 if args.no_half else jnp.bfloat16
        ds = ImageFolderDataset(args.calib_dir, img_size=args.img_width,
                                batch_size=args.batch_size)
        n_img = min(len(ds), args.calib_batches * args.batch_size)
        imgs = np.stack([ds[i][0] for i in range(n_img)])
        batches = [
            jnp.asarray(imgs[i:i + args.batch_size].astype(np.float32) / 255.0, dtype)
            for i in range(0, n_img, args.batch_size)
        ]
        LOGGER.info("int8 calibration on %d images from %s", n_img, args.calib_dir)
        _, variables = quantize_model(
            model_cfg, variables, batches, dtype=dtype, nc=args.nc,
            decompose_map=decompose_map, method=args.calib_method,
        )

    if args.out:
        out = args.out
    elif args.dst:
        Path(args.dst).mkdir(parents=True, exist_ok=True)
        out = str(Path(args.dst) / (Path(args.weights).stem + f"_{args.type}"))
    else:
        out = str(Path(args.weights).with_name(
            Path(args.weights).stem + f"_{args.type}"
        ))
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    paths = export_serving(
        model_cfg,
        variables,
        out,
        batch_size=args.batch_size,
        img_size=(args.img_height, args.img_width),
        nc=args.nc,
        conf_thres=args.conf_t,
        iou_thres=args.iou_t,
        top_k=args.top_k,
        keep_top_k=args.keep_top_k,
        include_nms=args.type == "tpu_nms",
        half=not args.no_half,
        platforms=platforms,
        decompose_map=decompose_map,
        quant=quant,
        raw_hw=tuple(args.raw_hw) if args.raw_hw else None,
    )

    if not args.no_dry_run:
        call = load_exported(paths["jaxexp"])
        in_h, in_w = args.raw_hw if args.raw_hw else (args.img_height, args.img_width)
        x = np.zeros((args.batch_size, in_h, in_w, 3), np.uint8)
        outs = call(x)
        outs = outs if isinstance(outs, tuple) else (outs,)
        LOGGER.info("dry run OK: %s", [tuple(np.asarray(o).shape) for o in outs])

    LOGGER.info("artifacts: %s", paths)


if __name__ == "__main__":
    main()

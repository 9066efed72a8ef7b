"""Validate a trained model: mAP over a labeled val set.

Parity target: /root/reference/val.py (load ckpt -> rect val loader ->
fuse -> YoloValidator with optional TTA / half / hybrid-label / profile).
TPU deltas: checkpoint is a msgpack pytree, "half" is bf16, fuse is the
fuse_params transformation, and the whole forward+NMS runs as fixed-shape
jitted device programs.

Usage:
    python cli/val.py --weights runs/train/xxx/best.ckpt --data-cfg res/configs/data/coco.yaml
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.utils.jax_setup import setup as _jax_setup

_jax_setup()

import json

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ayolov2_tpu.data import DataLoader, DetectionDataset
from ayolov2_tpu.eval import YoloValidator
from ayolov2_tpu.models import build_model, count_params, fuse_params
from ayolov2_tpu.utils.checkpoint import load_variables
from ayolov2_tpu.utils.config import load_yaml
from ayolov2_tpu.utils.general import check_img_size
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("val")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Validate a model (reference val.py parity).")
    parser.add_argument("--weights", type=str, default="", help="checkpoint path (.ckpt)")
    parser.add_argument("--model-cfg", type=str, default="", help="model YAML (else from ckpt meta)")
    parser.add_argument("--data-cfg", type=str, default="res/configs/data/coco.yaml")
    parser.add_argument("-iw", "--img-width", type=int, default=640)
    parser.add_argument("-ih", "--img-height", type=int, default=-1)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("-ct", "--conf-t", type=float, default=0.001)
    parser.add_argument("-it", "--iou-t", type=float, default=0.65)
    parser.add_argument("--device", type=str, default="",
                        help="reference-CLI parity (GPU id string); this build "
                             "targets the ambient TPU/mesh — value is logged only")
    parser.add_argument("--dst", type=str, default="exp",
                        help="run dir root: {dst}/val/{DATE}_runs (plots/JSON land here)")
    parser.add_argument("--top-k", type=int, default=512,
                        help="NMS objectness pre-filter top-k (TRT topK analogue)")
    parser.add_argument("-ktk", "--keep-top-k", type=int, default=0,
                        help="detections kept after NMS (TRT keepTopK); 0 = --max-det")
    parser.add_argument("--rect", action="store_true", dest="rect", default=True,
                        help="rectangular val batches (default)")
    parser.add_argument("--plot", action="store_true",
                        help="save PR/F1/confusion plots under the run dir")
    parser.add_argument("--profile", action="store_true",
                        help="profile the forward before validation")
    parser.add_argument("--n-profile", type=int, default=100,
                        help="iterations for --profile")
    parser.add_argument("--half", action="store_true",
                        help="reference-CLI parity: half precision is the default "
                             "here (bf16); use --no-half for fp32")
    parser.add_argument("--tta-cfg", type=str, default="res/configs/cfg/tta.yaml",
                        help="TTA scales/flips YAML (reference res/configs/cfg/tta.yaml)")
    parser.add_argument("--nms-type", "--nms_type", type=str, default="nms",
                        choices=["nms", "batched_nms", "fast_nms", "matrix_nms", "merge_nms"])
    parser.add_argument("--max-det", type=int, default=300)
    parser.add_argument("--single-cls", action="store_true")
    parser.add_argument("--tta", action="store_true", help="test-time augmentation")
    parser.add_argument("--hybrid-label", action="store_true", help="inject GT into NMS candidates")
    parser.add_argument("--no-half", action="store_true", help="fp32 compute instead of bf16")
    parser.add_argument("--no-rect", action="store_false", dest="rect", help="square batches instead of rect")
    parser.add_argument("--no-fuse", action="store_true", help="skip conv+BN folding")
    parser.add_argument("--int8", action="store_true",
                        help="validate the int8 PTQ serving graph (extra vs "
                             "reference: the TRT int8-engine validation analogue, "
                             "model_converter.py:147-260); calibrates on the first "
                             "--calib-batches val batches")
    parser.add_argument("--calib-batches", type=int, default=4,
                        help="calibration batches for --int8")
    parser.add_argument("--calib-method", type=str, default="absmax",
                        choices=["absmax", "p999"],
                        help="int8 input-range calibration: full absmax "
                             "(default; measured better on the fixture, see "
                             "STATUS.md) or 99.9th-percentile clipping")
    parser.add_argument("--profile-step", type=int, default=0, help="profile forward N times")
    parser.add_argument("-v", "--verbose", type=int, nargs="?", const=1, default=1,
                        help="verbosity level (reference type; >=2 = per-class metrics)")
    parser.add_argument("--n-skip", type=int, default=0, help="skip every n images")
    parser.add_argument("--json-path", type=str, default="", help="write result metrics JSON here")
    return parser


def load_sidecar(weights: str, args: argparse.Namespace) -> None:
    """Exported models carry a sidecar yaml that overrides CLI args at val
    time (reference export.py:189-190 / val.py:246-275 semantics)."""
    sidecar = Path(weights).with_suffix(".yaml")
    if not sidecar.exists():
        return
    cfg = yaml.safe_load(sidecar.read_text()) or {}
    for k, v in cfg.items():
        k = k.replace("-", "_")
        if hasattr(args, k):
            setattr(args, k, v)
            LOGGER.info("sidecar override: %s = %s", k, v)


def profile_model(model, variables, img_hw, batch_size: int, n_run: int, dtype) -> float:
    """Latency profile (kindle model.profile parity, val.py:337-342)."""
    fwd = jax.jit(lambda im: model.apply(variables, im.astype(dtype) / 255.0, training=False)[0])
    images = jnp.zeros((batch_size, img_hw[0], img_hw[1], 3), jnp.uint8)
    # hard D2H sync, not block_until_ready: the tunneled axon backend's
    # block_until_ready returns before device completion (bench.py note)
    float(jnp.sum(fwd(images)))  # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(n_run):
        out = fwd(images)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_run / batch_size * 1e3
    LOGGER.info("Profile: %.2f ms/image (batch %d, %d runs)", dt, batch_size, n_run)
    return dt


def validate_exported(args, data_cfg, nc: int, names) -> dict:
    """Validate a .jaxexp serving artifact: fixed (bs, k, 6) + counts out —
    the TRT-engine validation path (convert_trt_out semantics)."""
    from ayolov2_tpu.export import load_exported

    call = load_exported(args.weights)
    sidecar = Path(args.weights).with_suffix(".yaml")
    meta = yaml.safe_load(sidecar.read_text()) if sidecar.exists() else {}
    bs, h, w = (meta.get("input", {}).get("shape") or [args.batch_size, args.img_height, args.img_width, 3])[:3]

    dataset = DetectionDataset(
        data_cfg["val_path"], img_size=max(h, w), batch_size=bs, rect=False,
        stride=32, n_skip=args.n_skip,
        label_type="segments" if str(data_cfg.get("dataset", "")).lower() == "coco" else "labels",
        single_cls=args.single_cls,
    )
    loader = DataLoader(dataset, batch_size=bs, shuffle=False, pad_final_batch=True)
    validator = YoloValidator(
        None, {}, loader, class_names=names,
        cfg={"nc": nc, "single_cls": args.single_cls, "verbose": args.verbose},
        detection_fn=call,
    )
    result = validator.validation()
    if args.json_path:
        Path(args.json_path).write_text(json.dumps({k: v for k, v in result.items() if k != "maps"}))
    return result


def main() -> dict:
    args = get_parser().parse_args()
    if args.device:
        LOGGER.info("--device=%s accepted for reference-CLI parity; this build "
                    "runs on the ambient JAX devices", args.device)
    if args.weights:
        # wandb run-path loading (reference val.py:276-278): a non-local
        # 'entity/project/run_id' weights arg downloads the run's best ckpt
        from ayolov2_tpu.utils.wandb_utils import get_ckpt_path

        args.weights = get_ckpt_path(args.weights)
        load_sidecar(args.weights, args)
    if args.img_height < 0:
        args.img_height = args.img_width

    data_cfg = load_yaml(args.data_cfg)
    nc = 1 if args.single_cls else int(data_cfg["nc"])
    names = data_cfg.get("names") or [str(i) for i in range(nc)]

    # --- exported-artifact path (reference .trt/.ts loading, val.py:241-278) ---
    if args.weights.endswith(".jaxexp"):
        return validate_exported(args, data_cfg, nc, names)

    # --- model + weights ---
    variables, meta = ({"params": {}, "batch_stats": {}}, {})
    model_cfg = args.model_cfg
    if args.weights:
        variables, meta = load_variables(args.weights, prefer_ema=True, model_cfg=args.model_cfg,
                                         nc=None if args.single_cls else nc)
        if not model_cfg and meta.get("model_cfg"):
            model_cfg = json.loads(meta["model_cfg"])
    assert model_cfg, "need --model-cfg or a checkpoint with embedded model config"
    # Tucker-decomposed ckpts carry their conv->(first,core,last) layer map
    # (decompose_model.py writes it); rebuild the same decomposed graph.
    decompose_map = json.loads(meta["decompose_map"]) if meta.get("decompose_map") else ()

    dtype = jnp.float32 if args.no_half else jnp.bfloat16
    fuse = not args.no_fuse
    model = build_model(model_cfg, dtype=dtype, fused=fuse, nc=None if args.single_cls else nc,
                        decompose_map=decompose_map)
    if not variables["params"]:
        LOGGER.warning("no weights given: validating a randomly initialized model")
        unfused = build_model(model_cfg, dtype=dtype, nc=None if args.single_cls else nc,
                              decompose_map=decompose_map)
        variables = unfused.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8), training=False
        )
    if fuse:
        variables = fuse_params(variables)
    LOGGER.info("Model: %s params", f"{count_params(variables['params']):,}")

    stride = int(max(model.stride))
    h = check_img_size(args.img_height, stride)
    w = check_img_size(args.img_width, stride)

    dataset = DetectionDataset(
        data_cfg["val_path"],
        img_size=max(h, w),
        batch_size=args.batch_size,
        rect=args.rect,
        pad=0.5,
        stride=stride,
        n_skip=args.n_skip,
        label_type="segments" if str(data_cfg.get("dataset", "")).lower() == "coco" else "labels",
        single_cls=args.single_cls,
    )
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False, pad_final_batch=True)

    if args.int8:
        if not fuse:
            raise SystemExit("--int8 requires the fused serving path (drop --no-fuse)")
        from ayolov2_tpu.compress.quantize import quantize_model

        batches = []
        for batch in loader:
            batches.append(jnp.asarray(batch.images).astype(dtype) / 255.0)
            if len(batches) >= args.calib_batches:
                break
        LOGGER.info("int8 PTQ: calibrating on %d val batches", len(batches))
        model, variables = quantize_model(
            model_cfg, variables, batches, dtype=dtype,
            nc=None if args.single_cls else nc, decompose_map=decompose_map,
            method=args.calib_method,
        )

    if args.profile_step > 0 or args.profile:
        n_run = args.profile_step or args.n_profile
        profile_model(model, variables, (h, w), args.batch_size, n_run, dtype)

    # TTA schedule from --tta-cfg (reference res/configs/cfg/tta.yaml).
    # The yaml uses torch NCHW flip dims (2=ud, 3=lr); ops/tta.py speaks
    # NHWC (1=ud, 2=lr) — map here so reference configs work verbatim.
    tta_scales = tta_flips = None
    if args.tta and args.tta_cfg and Path(args.tta_cfg).exists():
        tta_cfg = yaml.safe_load(Path(args.tta_cfg).read_text()) or {}
        tta_scales = tta_cfg.get("scales")
        raw_flips = tta_cfg.get("flips")
        if raw_flips is not None:
            tta_flips = [None if f is None else {2: 1, 3: 2}[int(f)] for f in raw_flips]

    plot_dir = None
    if args.plot:
        from ayolov2_tpu.utils.config import make_run_dir

        plot_dir = str(make_run_dir(args.dst, "val"))
        LOGGER.info("plots -> %s", plot_dir)

    validator = YoloValidator(
        model,
        variables,
        loader,
        class_names=names,
        cfg={
            "conf_t": args.conf_t,
            "iou_t": args.iou_t,
            "nms_type": args.nms_type,
            "single_cls": args.single_cls,
            "max_det": args.keep_top_k or args.max_det,
            "pre_top_k": args.top_k,
            "tta": args.tta,
            "tta_scales": tta_scales,
            "tta_flips": tta_flips,
            "hybrid_label": args.hybrid_label,
            "half": not args.no_half,
            "verbose": args.verbose,
            "plot_dir": plot_dir,
        },
    )
    result = validator.validation()
    if args.json_path:
        out = {k: v for k, v in result.items() if k != "maps"}
        Path(args.json_path).write_text(json.dumps(out, indent=2))
    return result


if __name__ == "__main__":
    main()

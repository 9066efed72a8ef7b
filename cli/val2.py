"""COCO-json inference + evaluation — the benchmark path.

Parity target: /root/reference/val2.py:167-311 — image-only loader -> model
(optionally TTA) -> batched NMS -> async JSON writer -> COCOmAPEvaluator
(+ pycocotools COCOeval cross-check when importable).

TPU deltas: forward + NMS are one fused jitted device program per batch
shape; the async writer is a thread; if no GT json exists, one is built
from the dataset's YOLO labels.

Usage:
    python cli/val2.py --weights best.ckpt --data-cfg res/configs/data/coco.yaml \
        --gt-json instances_val2017.json --json-path answersheet.json
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

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.data import DataLoader, DetectionDataset, ImageFolderDataset
from ayolov2_tpu.models import build_model, fuse_params
from ayolov2_tpu.ops.nms import batched_nms
from ayolov2_tpu.ops.tta import inference_with_tta
from ayolov2_tpu.utils.checkpoint import load_variables
from ayolov2_tpu.utils.config import load_yaml
from ayolov2_tpu.utils.general import TimeChecker, check_img_size
from ayolov2_tpu.utils.logger import get_logger
from ayolov2_tpu.utils.metrics import COCOmAPEvaluator
from ayolov2_tpu.utils.result_writer import ResultWriter, yolo_labels_to_coco_json

LOGGER = get_logger("val2")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="COCO-json inference + mAP (val2.py parity).")
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--model-cfg", type=str, default="")
    parser.add_argument("--data-cfg", type=str, default="res/configs/data/coco.yaml")
    parser.add_argument("--gt-json", type=str, default="", help="COCO GT json (built from labels if empty)")
    parser.add_argument("--json-path", type=str, default="answersheet.json")
    parser.add_argument("-iw", "--img-width", type=int, default=640)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("-ct", "--conf-t", type=float, default=0.001)
    parser.add_argument("-it", "--iou-t", type=float, default=0.65)
    parser.add_argument("--nms-type", "--nms_type", type=str, default="nms")
    parser.add_argument("--top-k", type=int, default=512)
    parser.add_argument("--keep-top-k", type=int, default=100)
    parser.add_argument("--nms-box", type=int, default=1000)
    parser.add_argument("--tta", action="store_true")
    parser.add_argument("--tta-cfg", type=str, default="res/configs/cfg/tta.yaml",
                        help="TTA scales/flips YAML (reference schema, NCHW flip dims)")
    parser.add_argument("--no-half", action="store_true")
    parser.add_argument("--half", action="store_true",
                        help="reference-CLI parity: bf16 is already the default")
    parser.add_argument("--rect", action="store_true", dest="rect", default=True,
                        help="rectangular batches (default)")
    parser.add_argument("--no-rect", action="store_false", dest="rect")
    parser.add_argument("--n-skip", type=int, default=0)
    parser.add_argument("--data", type=str, default="",
                        help="validation image root (overrides data-cfg val_path)")
    parser.add_argument("--device", type=str, default="",
                        help="reference-CLI parity (GPU id); logged only on TPU")
    parser.add_argument("--dst", type=str, default="exp",
                        help="export dir root: {dst}/val2/{DATE}_runs")
    parser.add_argument("-ih", "--img-height", type=int, default=-1)
    parser.add_argument("--agnostic", action="store_true",
                        help="class-agnostic NMS (no class coordinate offset)")
    parser.add_argument("--single-cls", action="store_true",
                        help="validate as a single class")
    parser.add_argument("--plot", action="store_true",
                        help="per-class report + plots under the dst run dir")
    parser.add_argument("--export", type=str, default="",
                        help="write pred-vs-GT debug renders to this dir")
    parser.add_argument("--no-coco", "--no_coco", action="store_true",
                        help="skip the pycocotools cross-check")
    parser.add_argument("--verbose", type=int, nargs="?", const=1, default=1)
    parser.add_argument("--check-map", type=float, default=-1.0,
                        help="fail unless mAP50 >= this value")
    parser.add_argument("--trace-dir", type=str, default="",
                        help="write a jax.profiler trace of the hot loop here")
    return parser


def main() -> dict:
    args = get_parser().parse_args()
    t = TimeChecker("val2")
    if args.device:
        LOGGER.info("--device=%s accepted for reference-CLI parity; running on "
                    "the ambient JAX devices", args.device)

    data_cfg = load_yaml(args.data_cfg)
    if args.data:
        data_cfg["val_path"] = args.data
    # single_cls folds labels/NMS to one class; the model graph keeps its nc
    # (reference semantics: the dataset folds, the net is unchanged)
    nc = int(data_cfg["nc"])
    dtype = jnp.float32 if args.no_half else jnp.bfloat16

    model_cfg = args.model_cfg
    variables = None
    decompose_map = ()
    if args.weights:
        from ayolov2_tpu.utils.wandb_utils import get_ckpt_path

        args.weights = get_ckpt_path(args.weights)  # wandb run-path support
        variables, meta = load_variables(args.weights, prefer_ema=True, model_cfg=args.model_cfg,
                                         nc=nc)
        if not model_cfg and meta.get("model_cfg"):
            model_cfg = json.loads(meta["model_cfg"])
        if meta.get("decompose_map"):
            decompose_map = json.loads(meta["decompose_map"])
    assert model_cfg, "need --model-cfg or a checkpoint with embedded model config"

    model = build_model(model_cfg, dtype=dtype, fused=True, nc=nc, decompose_map=decompose_map)
    if variables is None:
        LOGGER.warning("no weights: random init")
        unfused = build_model(model_cfg, dtype=dtype, nc=nc, decompose_map=decompose_map)
        variables = unfused.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8), training=False)
    variables = fuse_params(variables)
    t.add("model")

    stride = int(max(model.stride))
    if args.img_height < 0:
        args.img_height = args.img_width
    img_size = check_img_size(max(args.img_width, args.img_height), stride)
    dataset = ImageFolderDataset(
        data_cfg["val_path"], img_size=img_size, batch_size=args.batch_size,
        rect=args.rect, pad=0.5, stride=stride, n_skip=args.n_skip,
    )
    loader = DataLoader(dataset, batch_size=args.batch_size, detection=False)
    t.add("dataset")

    tta_kw = {}
    if args.tta and args.tta_cfg and Path(args.tta_cfg).exists():
        import yaml as _yaml

        tta_cfg = _yaml.safe_load(Path(args.tta_cfg).read_text()) or {}
        if tta_cfg.get("scales") is not None:
            tta_kw["scales"] = tuple(tta_cfg["scales"])
        if tta_cfg.get("flips") is not None:  # torch NCHW dims -> NHWC axes
            tta_kw["flips"] = tuple(
                None if f is None else {2: 1, 3: 2}[int(f)] for f in tta_cfg["flips"]
            )

    @jax.jit
    def serve(images):
        imgs = images.astype(dtype) / jnp.asarray(255.0, dtype)
        if args.tta:
            pred = inference_with_tta(
                lambda x: model.apply(variables, x, training=False)[0].astype(jnp.float32),
                imgs, nl=model.nl, gs=stride, **tta_kw,
            )
        else:
            pred = model.apply(variables, imgs, training=False)[0].astype(jnp.float32)
        return batched_nms(
            pred,
            conf_thres=args.conf_t,
            iou_thres=args.iou_t,
            nms_box=args.nms_box,
            pre_top_k=args.top_k,
            keep_top_k=args.keep_top_k,
            agnostic=args.agnostic or args.single_cls,
            nms_type=args.nms_type,
            multi_label=not args.single_cls,
        )

    writer = ResultWriter(args.json_path)
    writer.start()
    seen = 0
    t.add("setup")
    t_infer = 0.0
    if args.trace_dir:
        # device+host trace of the hot loop (TimeChecker's device-level
        # counterpart; view with tensorboard/xprof)
        jax.profiler.start_trace(args.trace_dir)
    for images, metas, indices, n_real in loader:
        h, w = images.shape[1:3]
        t0 = time.perf_counter()
        det, n_valid = serve(jnp.asarray(images))
        det.block_until_ready()
        t_infer += time.perf_counter() - t0
        # metas/indices are pre-truncated to the real (unpadded) items
        paths = [dataset.img_files[i] for i in indices]
        writer.add_outputs(paths, np.asarray(det)[:n_real], np.asarray(n_valid)[:n_real], (h, w), metas)
        seen += n_real
    if args.trace_dir:
        jax.profiler.stop_trace()
        LOGGER.info("profiler trace written to %s", args.trace_dir)
    results = writer.close()
    t.add("inference")
    LOGGER.info("%d images, %.1f ms/img inference+NMS, %d predictions",
                seen, t_infer / max(seen, 1) * 1e3, len(results))

    if args.gt_json:
        gt = args.gt_json
    else:
        LOGGER.info("no GT json given: building one from YOLO labels")
        label_ds = DetectionDataset(
            data_cfg["val_path"], img_size=img_size, batch_size=args.batch_size,
            stride=stride, n_skip=args.n_skip,
            label_type="segments" if str(data_cfg.get("dataset", "")).lower() == "coco" else "labels",
            single_cls=args.single_cls,
        )
        gt = yolo_labels_to_coco_json(label_ds)

    export_root = args.export
    if args.plot and not export_root:
        from ayolov2_tpu.utils.config import make_run_dir

        export_root = str(make_run_dir(args.dst, "val2"))
    evaluator = COCOmAPEvaluator(gt, cat_from_yolo=False, export_root=export_root or None)
    metrics = evaluator.evaluate(results, max_det=args.keep_top_k)
    if args.plot or args.export or args.verbose >= 2:
        # per-class tabulate report (+ pred-vs-GT renders when exporting)
        evaluator.evaluate_per_class(results, debug=bool(args.export))
    t.add("eval")
    LOGGER.info("COCO eval: %s", {k: round(v, 4) for k, v in metrics.items()})
    LOGGER.info("%s", t)

    if args.no_coco:
        pass
    else:
        _pycoco_crosscheck(gt, args.json_path)

    if args.check_map >= 0:
        assert metrics["map50"] >= args.check_map, (
            f"mAP50 {metrics['map50']:.4f} < required {args.check_map}"
        )
    return metrics


def _pycoco_crosscheck(gt, json_path: str) -> None:
    try:  # cross-check with pycocotools when available (val2.py:298-309)
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval

        coco_gt = COCO(gt if isinstance(gt, str) else None)
        if not isinstance(gt, str):
            coco_gt.dataset = gt
            coco_gt.createIndex()
        coco_dt = coco_gt.loadRes(json_path)
        ev = COCOeval(coco_gt, coco_dt, "bbox")
        ev.evaluate(); ev.accumulate(); ev.summarize()
    except ImportError:
        pass


if __name__ == "__main__":
    main()

"""One-command accuracy-parity check against the reference's published table.

Takes a reference torch checkpoint (.pt) or a native .ckpt, runs COCO
validation, and diffs mAP@0.5:0.95 / mAP@0.5 against the reference
README's pretrained-model table (/root/reference/README.md:206-211),
identifying the model row by exact parameter count. BASELINE.md demands
mAP@0.5:0.95 within 0.1 — the moment real pretrained weights are
available, this command is the parity gate:

    python cli/check_reference_parity.py --weights yolov5s.pt \
        --data-cfg res/configs/data/coco.yaml

Exit code 0 = within tolerance, 1 = parity failure, 2 = unknown model.
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

from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger("check_parity")

# README.md:206-211 — (mAP@0.5:0.95, mAP@0.5) by exact param count
REFERENCE_TABLE = {
    7235389: ("YOLOv5s", 0.382, 0.575),
    21190557: ("YOLOv5m", 0.450, 0.639),
    26855105: ("YOLOv5l-decomposed", 0.469, 0.656),
    46563709: ("YOLOv5l", 0.480, 0.666),
    51512570: ("YOLOv5x-decomposed", 0.492, 0.676),
    86749405: ("YOLOv5x", 0.496, 0.681),
}


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Reference accuracy parity check")
    p.add_argument("--weights", type=str, required=True, help=".pt (reference) or .ckpt")
    p.add_argument("--model-cfg", type=str, default="res/configs/model/yolov5s.yaml",
                   help="model YAML (used for .pt import; .ckpt embeds its own)")
    p.add_argument("--data-cfg", type=str, default="res/configs/data/coco.yaml")
    p.add_argument("--img-width", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--conf-t", type=float, default=0.001)
    p.add_argument("--iou-t", type=float, default=0.65)
    p.add_argument("--n-skip", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=0.001,
                   help="allowed mAP@0.5:0.95 shortfall vs the table (BASELINE.md: 0.001)")
    p.add_argument("--json-out", type=str, default="")
    return p


def main() -> int:
    args = get_parser().parse_args()

    import jax
    import jax.numpy as jnp

    from ayolov2_tpu.data import DataLoader, DetectionDataset
    from ayolov2_tpu.eval import YoloValidator
    from ayolov2_tpu.models import build_model, count_params, fuse_params, init_model
    from ayolov2_tpu.models.builder import parse_model_config
    from ayolov2_tpu.utils.checkpoint import load_variables
    from ayolov2_tpu.utils.config import load_yaml
    from ayolov2_tpu.utils.general import check_img_size

    data_cfg = load_yaml(args.data_cfg)
    nc = int(data_cfg["nc"])

    # --- weights: reference .pt -> import; .ckpt -> load ---
    decompose_map = ()
    if args.weights.endswith(".pt"):
        from ayolov2_tpu.utils.torch_import import (
            load_torch_checkpoint,
            torch_state_dict_to_pytree,
        )

        model_cfg = parse_model_config(args.model_cfg)
        model_f32 = build_model(model_cfg, dtype=jnp.float32, nc=nc)
        variables = init_model(model_f32, jax.random.PRNGKey(0), img_size=args.img_width)
        sd = load_torch_checkpoint(args.weights, prefer_ema=True)
        params, stats, n, unmatched = torch_state_dict_to_pytree(
            sd, variables["params"], variables.get("batch_stats", {})
        )
        LOGGER.info("torch import: %d tensors matched, %d unmatched", n, len(unmatched))
        if unmatched:
            LOGGER.warning("unmatched tensors: %s", unmatched[:10])
        variables = {"params": params, "batch_stats": stats}
    else:
        variables, meta = load_variables(args.weights, prefer_ema=True)
        model_cfg = json.loads(meta["model_cfg"]) if meta.get("model_cfg") else parse_model_config(args.model_cfg)
        # Tucker-decomposed ckpts (the YOLOv5l/x-decomposed table rows) trace
        # as 1x1->kxk->1x1 stacks — the graph must match the param tree
        decompose_map = json.loads(meta["decompose_map"]) if meta.get("decompose_map") else ()

    n_params = count_params(variables["params"])
    row = REFERENCE_TABLE.get(n_params)
    LOGGER.info("model: %s params -> %s", f"{n_params:,}", row[0] if row else "UNKNOWN")

    # --- validate (fused bf16 serving graph, reference val defaults) ---
    model = build_model(model_cfg, dtype=jnp.bfloat16, fused=True, nc=nc,
                        decompose_map=decompose_map)
    stride = int(max(model.stride))
    w = check_img_size(args.img_width, stride)
    dataset = DetectionDataset(
        data_cfg["val_path"], img_size=w, batch_size=args.batch_size,
        rect=True, pad=0.5, stride=stride, n_skip=args.n_skip,
        label_type="segments" if str(data_cfg.get("dataset", "")).lower() == "coco" else "labels",
    )
    loader = DataLoader(dataset, batch_size=args.batch_size)
    validator = YoloValidator(
        model, fuse_params(variables), loader,
        class_names=data_cfg.get("names"),
        cfg={"conf_t": args.conf_t, "iou_t": args.iou_t},
    )
    result = validator.validation()
    map5095, map50 = result["map50_95"], result["map50"]

    report = {
        "weights": args.weights,
        "params": int(n_params),
        "model": row[0] if row else None,
        "map50_95": float(map5095),
        "map50": float(map50),
    }
    if row:
        name, ref_map, ref_map50 = row
        report.update(ref_map50_95=ref_map, ref_map50=ref_map50,
                      diff_map50_95=float(map5095 - ref_map),
                      diff_map50=float(map50 - ref_map50))
        LOGGER.info(
            "%s: mAP@0.5:0.95 %.4f (ref %.3f, diff %+.4f) | mAP@0.5 %.4f (ref %.3f, diff %+.4f)",
            name, map5095, ref_map, map5095 - ref_map, map50, ref_map50, map50 - ref_map50,
        )
        ok = map5095 >= ref_map - args.tolerance
        report["parity"] = bool(ok)
        LOGGER.info("parity (tolerance %.3f): %s", args.tolerance, "PASS" if ok else "FAIL")
    else:
        LOGGER.warning("param count %s not in the reference table — reporting only", f"{n_params:,}")
        ok = None

    if args.json_out:
        Path(args.json_out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    if ok is None:
        return 2
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

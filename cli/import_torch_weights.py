"""Convert a reference torch checkpoint (.pt) into our .ckpt format.

The migration path for users of the reference: their trained
kindle-YOLOModel weights load here without retraining.

Usage:
    python cli/import_torch_weights.py --weights yolov5s.pt \
        --model-cfg res/configs/model/yolov5s.yaml --nc 80 --out yolov5s.ckpt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # conversion is host-side

import jax
import jax.numpy as jnp

from ayolov2_tpu.models import build_model, init_model
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.utils.checkpoint import save_checkpoint
from ayolov2_tpu.utils.logger import get_logger
from ayolov2_tpu.utils.torch_import import load_torch_checkpoint, torch_state_dict_to_pytree

LOGGER = get_logger("import_torch")


def main() -> None:
    parser = argparse.ArgumentParser(description="torch .pt -> .ckpt converter")
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--model-cfg", type=str, required=True)
    parser.add_argument("--nc", type=int, default=80)
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--no-ema", action="store_true", help="prefer model over ema branch")
    parser.add_argument("--out", type=str, default="")
    args = parser.parse_args()

    model_cfg = parse_model_config(args.model_cfg)
    model = build_model(model_cfg, dtype=jnp.float32, nc=args.nc)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=args.img_size)

    sd = load_torch_checkpoint(args.weights, prefer_ema=not args.no_ema)
    params, stats, n, unmatched = torch_state_dict_to_pytree(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    LOGGER.info("matched %d tensors (%d unmatched)", n, len(unmatched))

    class _S:
        pass

    s = _S()
    s.params = params
    s.batch_stats = stats
    s.ema_params = params
    s.ema_batch_stats = stats
    s.ema_updates = jnp.zeros((), jnp.int32)
    s.step = jnp.zeros((), jnp.int32)
    s.opt_state = None

    out = args.out or str(Path(args.weights).with_suffix(".ckpt"))
    save_checkpoint(out, s, epoch=0, model_cfg=model_cfg, include_optimizer=False)
    LOGGER.info("wrote %s", out)


if __name__ == "__main__":
    main()

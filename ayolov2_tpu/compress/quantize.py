"""Post-training int8 quantization for the serving path (TPU int8 MXU).

The TPU-native analogue of the reference's TensorRT int8 deployment:
``export.py --dtype int8`` routes through the TRT builder's int8 flag with an
entropy calibrator (scripts/model_converter/model_converter.py:147-260,
export.py:85,176).  Here the same capability is a pair of pure functions over
the fused parameter pytree:

  1. :func:`collect_activation_stats` — run the fused model in ``quant="calib"``
     mode over calibration batches; every quantizable conv sows its input
     absolute maximum into the ``quant_stats`` collection (per-tensor symmetric
     calibration — the max-calibrator analogue of TRT's IInt8EntropyCalibrator2).
  2. :func:`quantize_params` — transform the fused ``{'params': ...}`` tree:
     each quantizable conv kernel becomes ``q_kernel`` int8 with per-output-
     channel ``w_scale`` plus the calibrated per-tensor ``in_scale``
     (models/layers._QuantConv parameter contract).

The quantized model is the same graph built with ``quant=True``; convs then
run s8 x s8 -> s32 contractions, which the v5e MXU executes at 2x the bf16
rate.  Eligibility (models/layers._quantizable): plain fused convs with
cin > 4 — the cin=3 stem, depthwise convs, Tucker-decomposed stacks, and the
YOLOHead's predict convs stay in float, matching standard detector PTQ
practice (TRT likewise keeps the BatchedNMS plugin path in float).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


def collect_activation_stats(
    calib_model, fused_variables: Dict[str, Any], batches: Iterable[jax.Array]
) -> Dict[str, Any]:
    """Run ``calib_model`` (built with ``quant="calib"``) over calibration
    batches; return the merged per-conv input-absmax tree.

    ``batches`` must be preprocessed exactly like serving inputs (letterboxed,
    /255, model dtype) — the calibrated ranges are only valid for the
    distribution they saw.
    """
    stats: Optional[Dict[str, Any]] = None
    fwd = jax.jit(
        lambda v, x: calib_model.apply(
            v, x, training=False, mutable=["quant_stats"]
        )[1]["quant_stats"]
    )
    n = 0
    for batch in batches:
        new = jax.device_get(fwd(fused_variables, batch))
        stats = new if stats is None else jax.tree_util.tree_map(np.maximum, stats, new)
        n += 1
    if stats is None:
        raise ValueError("calibration needs at least one batch")
    LOGGER.info("int8 calibration: %d batches", n)
    return stats


def quantize_params(
    fused_variables: Dict[str, Any], stats: Dict[str, Any], method: str = "absmax"
) -> Dict[str, Any]:
    """Fused ``{'params': ...}`` + calibration stats -> int8 params tree.

    Pure tree transform mirroring models/layers._quantizable: a ``conv``
    sub-dict ``{kernel (k,k,cin,f), bias}`` with cin > 4 whose module sowed
    an ``in_absmax`` during calibration becomes the _QuantConv tree
    ``{q_kernel, w_scale, in_scale, bias}``.  Everything else passes through
    unchanged.

    ``method``: "absmax" uses the full calibrated input range; "p999" clips
    the range at the 99.9th percentile of |x| (outliers saturate, the bulk
    of the distribution gets 8x finer steps — the clipped-calibration idea
    behind TRT's IInt8EntropyCalibrator2).
    """
    stat_key = {"absmax": "in_absmax", "p999": "in_p999"}[method]
    n_quant = 0

    def walk(p: Dict[str, Any], s: Any) -> Dict[str, Any]:
        nonlocal n_quant
        out: Dict[str, Any] = {}
        s = s if isinstance(s, dict) else {}
        for k, v in p.items():
            if not isinstance(v, dict):
                out[k] = v
                continue
            if (
                k == "conv"
                and set(v) == {"kernel", "bias"}
                and getattr(v["kernel"], "ndim", 0) == 4
                and v["kernel"].shape[2] > 4
                and stat_key in s
            ):
                kern = np.asarray(v["kernel"], np.float32)
                w_scale = np.maximum(np.abs(kern).max(axis=(0, 1, 2)), 1e-12) / 127.0
                q = np.clip(np.rint(kern / w_scale), -127, 127).astype(np.int8)
                in_absmax = float(np.asarray(s[stat_key]))
                out[k] = {
                    "q_kernel": jnp.asarray(q),
                    "w_scale": jnp.asarray(w_scale, jnp.float32),
                    "in_scale": jnp.asarray(max(in_absmax, 1e-6), jnp.float32),
                    "bias": jnp.asarray(v["bias"], jnp.float32),
                }
                n_quant += 1
            else:
                out[k] = walk(v, s.get(k, {}))
        return out

    qparams = walk(fused_variables["params"], stats)
    if n_quant == 0:
        raise ValueError(
            "no conv was quantized — calibration stats don't match the "
            "parameter tree (same model config / fused variables required)"
        )
    LOGGER.info("int8 quantization: %d convs", n_quant)
    return {"params": qparams}


def quantize_model(
    model_cfg: Union[str, Dict[str, Any]],
    variables: Dict[str, Any],
    calib_batches: Iterable[jax.Array],
    dtype: Any = jnp.bfloat16,
    nc: Optional[int] = None,
    decompose_map: Any = (),
    method: str = "absmax",
) -> Tuple[Any, Dict[str, Any]]:
    """One-call PTQ: fuse (if needed) -> calibrate -> quantize.

    ``variables`` may be unfused ({'params', 'batch_stats'}) or already fused.
    Returns ``(quant_model, quant_variables)`` where ``quant_model`` is the
    graph built with ``fused=True, quant=True`` — drop-in for the fused model
    in the serving/export paths.
    """
    from ayolov2_tpu.models.builder import build_model, fuse_params

    if "batch_stats" in variables:
        variables = fuse_params(variables)
    calib_model = build_model(
        model_cfg, dtype=dtype, fused=True, nc=nc,
        decompose_map=decompose_map, quant="calib",
    )
    stats = collect_activation_stats(calib_model, variables, calib_batches)
    qvars = quantize_params(variables, stats, method=method)
    qmodel = build_model(
        model_cfg, dtype=dtype, fused=True, nc=nc,
        decompose_map=decompose_map, quant=True,
    )
    return qmodel, qvars

"""AOT export of the serving graph (uint8 image batch -> NMS'd detections).

Parity target: /root/reference/scripts/model_converter/model_converter.py +
export.py — the reference exports TorchScript / ONNX / TensorRT engines, the
TensorRT path grafting a BatchedNMS_TRT plugin so the serving graph is
image-in/boxes-out (:268-388) with fixed (bs, keep_top_k, 6) outputs and a
sidecar yaml that overrides val-time args (export.py:189-190).

TPU-native equivalents produced here:
  - ``{name}.jaxexp``  — the full jax.export artifact (Python reload via
    :func:`load_exported`; cross-version calling convention handled by jax)
  - ``{name}.stablehlo`` — the raw serialized StableHLO module, consumed by
    the C++ PJRT runner (cpp/src/pjrt_runner) through
    PJRT_Client_Compile(format="mlir") — the TorchScript/TRT-loader parity
  - ``{name}.yaml`` — sidecar val-arg overrides + IO spec

The exported graph bakes in /255 normalization, the fused-conv forward,
decode, and the fixed-shape batched NMS — the whole path stays on device,
like the TRT engine with its NMS plugin.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from jax import export as jax_export

from ayolov2_tpu.models import build_model, fuse_params
from ayolov2_tpu.ops.nms import batched_nms
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


def letterbox_geometry(
    raw_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    scale_up: bool = True,
) -> Tuple[float, Tuple[int, int], Tuple[int, int, int, int], Tuple[float, float]]:
    """Static letterbox geometry — every value a Python constant at trace time.

    Mirrors the host letterbox (data/datasets.py:66-104, itself the parity
    re-creation of reference data_loader.py:395-459) with ``auto=False``
    (exact target shape, the val/serving mode). Returns
    ``(r, new_unpad_hw, (top, bottom, left, right), (dw, dh))`` where ``r``
    is the content scale, ``new_unpad_hw`` the resized content shape, the
    4-tuple the pad widths (complement-computed so the padded shape is
    exactly ``img_hw``), and ``(dw, dh)`` the half-pad floats that
    scale_coords uses to de-letterbox (utils/boxes.py:101-125).
    """
    r = min(img_hw[0] / raw_hw[0], img_hw[1] / raw_hw[1])
    if not scale_up:
        r = min(r, 1.0)
    new_unpad_hw = (int(round(raw_hw[0] * r)), int(round(raw_hw[1] * r)))
    dw = (img_hw[1] - new_unpad_hw[1]) / 2
    dh = (img_hw[0] - new_unpad_hw[0]) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom = img_hw[0] - new_unpad_hw[0] - top
    right = img_hw[1] - new_unpad_hw[1] - left
    return r, new_unpad_hw, (top, bottom, left, right), (dw, dh)


def device_letterbox(
    images: jax.Array,
    raw_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    scale_up: bool = True,
    color: float = 114.0,
    dtype=jnp.float32,
) -> jax.Array:
    """In-graph letterbox: uint8 NHWC batch -> float ``img_hw`` batch [0,255].

    Bilinear resize with half-pixel centers (``jax.image.resize`` method
    "linear", antialias off) — the sampling cv2.INTER_LINEAR uses — then a
    constant 114 pad. Shapes are static (raw_hw is fixed at export time),
    so the whole preprocess lowers into the serving XLA program: the C++
    PJRT runner becomes raw-camera-frame-in / native-coordinate-boxes-out
    with zero host cv2 (SURVEY §7 "whole inference path on device").
    """
    r, new_unpad_hw, (top, bottom, left, right), _ = letterbox_geometry(
        raw_hw, img_hw, scale_up
    )
    x = images.astype(dtype)
    if new_unpad_hw != tuple(raw_hw):
        x = jax.image.resize(
            x,
            (x.shape[0], new_unpad_hw[0], new_unpad_hw[1], x.shape[3]),
            method="linear",
            antialias=False,
        )
    return jnp.pad(
        x,
        ((0, 0), (top, bottom), (left, right), (0, 0)),
        constant_values=color,
    )


def make_raw_serving_fn(
    model,
    variables: Optional[Dict[str, Any]],
    raw_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    conf_thres: float = 0.001,
    iou_thres: float = 0.65,
    top_k: int = 512,
    keep_top_k: int = 100,
    nms_box: int = 1000,
    image_dtype=jnp.bfloat16,
    scale_up: bool = True,
) -> Callable:
    """Raw uint8 frames in -> detections in RAW-image coordinates.

    The on-device analogue of host-letterbox -> serve -> scale_coords:
    in-graph letterbox (``device_letterbox``), fused decode+NMS at
    ``img_hw``, then the scale_coords de-letterbox (utils/boxes.py:101-125)
    applied to the kept boxes with the static (r, dw, dh) constants. The
    reference never gets this far — its TRT engine still needs host-side
    letterbox + convert_trt_out descaling (train_utils.py:262-283).
    """
    from ayolov2_tpu.models.yolo_head import YOLOHead
    from ayolov2_tpu.ops.nms import flat_grid_meta, flatten_raw_maps, fused_decode_nms

    head = YOLOHead(nc=model.nc, anchors=model.anchors, strides=model.strides)
    grid_xy, anchor_wh, stride = (
        jnp.asarray(v) for v in flat_grid_meta(model.strides, head.anchor_grid(), img_hw)
    )
    r, _, _, (dw, dh) = letterbox_geometry(raw_hw, img_hw, scale_up)

    def serve_raw(v, images: jax.Array):
        lb = device_letterbox(images, raw_hw, img_hw, scale_up, dtype=image_dtype)
        imgs = lb / jnp.asarray(255.0, image_dtype)
        raw = model.apply(v, imgs, training=True)
        det, n = fused_decode_nms(
            flatten_raw_maps(raw),
            grid_xy, anchor_wh, stride,
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            nms_box=nms_box,
            pre_top_k=top_k,
            keep_top_k=keep_top_k,
            multi_label=False,
        )
        boxes = det[..., :4]
        shift = jnp.asarray([dw, dh, dw, dh], det.dtype)
        upper = jnp.asarray([raw_hw[1], raw_hw[0], raw_hw[1], raw_hw[0]], det.dtype)
        boxes = jnp.clip((boxes - shift) / r, 0.0, upper)
        return jnp.concatenate([boxes, det[..., 4:]], axis=-1), n

    if variables is None:
        return serve_raw
    return lambda images: serve_raw(variables, images)


def make_serving_fn(
    model,
    variables: Optional[Dict[str, Any]],
    conf_thres: float = 0.001,
    iou_thres: float = 0.65,
    top_k: int = 512,
    keep_top_k: int = 100,
    nms_box: int = 1000,
    include_nms: bool = True,
    image_dtype=jnp.bfloat16,
    fused_decode: bool = False,
    img_hw: Optional[Tuple[int, int]] = None,
) -> Callable:
    """uint8 NHWC batch -> ((bs, keep_top_k, 6) detections, (bs,) counts).

    Output contract mirrors the TRT BatchedNMS plugin
    (model_converter.py:382-387) which convert_trt_out consumes
    (train_utils.py:262-283). With include_nms=False, returns the decoded
    (bs, N, 5+nc) predictions (the ONNX/TorchScript-style export).

    ``fused_decode``: decode only the obj-prefiltered candidates in fp32
    (ops/nms.fused_decode_nms) — ~25x less decode HBM traffic; requires
    ``img_hw`` for the grid constants.

    ``variables=None`` returns the two-argument core ``(variables, images)``
    instead of closing over the params — required for sharded serving and
    for yolov5l/x through the remote-compile service (closure-captured
    weights bake into the HLO as constants; >150MB payloads are rejected).
    """
    if fused_decode and include_nms:
        assert img_hw is not None, "fused_decode needs img_hw for grid constants"
        from ayolov2_tpu.models.yolo_head import YOLOHead
        from ayolov2_tpu.ops.nms import flat_grid_meta, flatten_raw_maps, fused_decode_nms

        head = YOLOHead(nc=model.nc, anchors=model.anchors, strides=model.strides)
        grid_xy, anchor_wh, stride = (
            jnp.asarray(v) for v in flat_grid_meta(model.strides, head.anchor_grid(), img_hw)
        )

        def serve_fused(v, images: jax.Array):
            imgs = images.astype(image_dtype) / jnp.asarray(255.0, image_dtype)
            raw = model.apply(v, imgs, training=True)
            return fused_decode_nms(
                flatten_raw_maps(raw),
                grid_xy, anchor_wh, stride,
                conf_thres=conf_thres,
                iou_thres=iou_thres,
                nms_box=nms_box,
                pre_top_k=top_k,
                keep_top_k=keep_top_k,
                multi_label=False,
            )

        if variables is None:
            return serve_fused
        return lambda images: serve_fused(variables, images)

    def serve(v, images: jax.Array):
        imgs = images.astype(image_dtype) / jnp.asarray(255.0, image_dtype)
        decoded, _ = model.apply(v, imgs, training=False)
        decoded = decoded.astype(jnp.float32)
        if not include_nms:
            return decoded
        return batched_nms(
            decoded,
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            nms_box=min(nms_box, decoded.shape[1]),
            pre_top_k=top_k,
            keep_top_k=keep_top_k,
            multi_label=False,
        )

    if variables is None:
        return serve
    return lambda images: serve(variables, images)


def export_serving(
    model_cfg: Any,
    variables: Dict[str, Any],
    out_path: str,
    batch_size: int = 32,
    img_size: Tuple[int, int] = (640, 640),
    nc: Optional[int] = None,
    conf_thres: float = 0.001,
    iou_thres: float = 0.65,
    top_k: int = 512,
    keep_top_k: int = 100,
    include_nms: bool = True,
    half: bool = True,
    fused_input: bool = False,
    platforms: Optional[Tuple[str, ...]] = None,
    decompose_map: Tuple = (),
    quant: bool = False,
    raw_hw: Optional[Tuple[int, int]] = None,
) -> Dict[str, str]:
    """Export the serving graph; returns the written file paths.

    Args:
        model_cfg: model YAML path or dict.
        variables: unfused {'params','batch_stats'} (fused offline here)
            or already-fused params with ``fused_input=True``.
        platforms: lowering platforms, e.g. ("tpu",) or ("cpu", "tpu") —
            default: the current backend.
        decompose_map: Tucker-decomposed conv layer map from a decomposed
            checkpoint's meta (cli/decompose_model.py).
        quant: export the int8-conv serving graph (the TRT int8-engine
            analogue, export.py --dtype int8); ``variables`` must then be
            the quantized tree from compress/quantize (implies fused).
        raw_hw: export the raw-frame variant instead: input is
            ``(bs, *raw_hw, 3)`` uint8 native-resolution frames, letterbox
            runs in-graph, and detections come back in RAW coordinates
            (requires include_nms).
    """
    dtype = jnp.bfloat16 if half else jnp.float32
    model = build_model(model_cfg, dtype=dtype, fused=True, nc=nc,
                        decompose_map=decompose_map, quant=quant)
    fused = variables if (fused_input or quant) else fuse_params(variables)
    if half and not quant:
        # bake the weight constants as bf16: the compute path casts every
        # f32 param to bf16 at apply time anyway (layers.py:133,139,159),
        # so this is bit-identical — and it halves the artifact (measured
        # 28.4 -> 14.2 MB for the fixture yolov5s; the TRT-fp16 engine
        # stores fp16 weights for the same reason)
        fused = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if getattr(x, "dtype", None) == jnp.float32 else x,
            fused,
        )

    if raw_hw is not None:
        assert include_nms, "raw_hw export requires include_nms"
        serve = make_raw_serving_fn(
            model, fused, raw_hw=tuple(raw_hw), img_hw=img_size,
            conf_thres=conf_thres, iou_thres=iou_thres,
            top_k=top_k, keep_top_k=keep_top_k, image_dtype=dtype,
        )
        in_hw = tuple(raw_hw)
    else:
        serve = make_serving_fn(
            model, fused, conf_thres=conf_thres, iou_thres=iou_thres,
            top_k=top_k, keep_top_k=keep_top_k, include_nms=include_nms,
            image_dtype=dtype, fused_decode=include_nms, img_hw=img_size,
        )
        in_hw = (img_size[0], img_size[1])
    spec = jax.ShapeDtypeStruct((batch_size, in_hw[0], in_hw[1], 3), jnp.uint8)
    exported = jax_export.export(jax.jit(serve), platforms=platforms)(spec)

    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    paths = {
        "jaxexp": str(out.with_suffix(".jaxexp")),
        "stablehlo": str(out.with_suffix(".stablehlo")),
        "yaml": str(out.with_suffix(".yaml")),
        "compile_options": str(out.with_suffix(".compile_options.pb")),
    }
    Path(paths["jaxexp"]).write_bytes(exported.serialize())
    Path(paths["stablehlo"]).write_bytes(exported.mlir_module_serialized)
    # serialized CompileOptionsProto (num_replicas=1) for the C++ PJRT
    # runner: libtpu-AOT compile paths reject an empty options proto
    try:
        from jaxlib.xla_client import CompileOptions

        copts = CompileOptions()
        copts.executable_build_options.num_replicas = 1
        copts.executable_build_options.num_partitions = 1
        Path(paths["compile_options"]).write_bytes(copts.SerializeAsString())
    except Exception as e:  # non-fatal: runner can take --compile-options
        LOGGER.warning("compile_options sidecar not written: %s", e)
        paths.pop("compile_options")
    sidecar = {
        # val-time overrides (export.py:189-190 contract)
        "batch_size": batch_size,
        "img_width": img_size[1],
        "img_height": img_size[0],
        "conf_t": conf_thres,
        "iou_t": iou_thres,
        "keep_top_k": keep_top_k,
        "top_k": top_k,
        "include_nms": include_nms,
        "half": half,
        "quant": quant,
        "platforms": list(exported.platforms),
        "on_device_letterbox": raw_hw is not None,
        **({"raw_height": in_hw[0], "raw_width": in_hw[1]} if raw_hw is not None else {}),
        "input": {"shape": [batch_size, in_hw[0], in_hw[1], 3], "dtype": "uint8"},
        "outputs": (
            [
                {"shape": [batch_size, keep_top_k, 6], "dtype": "float32"},
                {"shape": [batch_size], "dtype": "int32"},
            ]
            if include_nms
            else [{"shape": "decoded", "dtype": "float32"}]
        ),
    }
    Path(paths["yaml"]).write_text(yaml.dump(sidecar))
    LOGGER.info("exported %s (platforms %s)", out, exported.platforms)
    return paths


def load_exported(path: str):
    """Reload a .jaxexp artifact; returns a callable (Python-side parity
    with the reference's TorchScript/TRT loaders in val.py:241-278)."""
    exported = jax_export.deserialize(Path(path).read_bytes())

    def call(images):
        return exported.call(jnp.asarray(images))

    return call

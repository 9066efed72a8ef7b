"""YAML -> flax model graph builder (the kindle re-creation, TPU-first).

Consumes the reference's model YAML schema verbatim (res/configs/model/*.yaml;
SURVEY.md §2.2): ``depth_multiple`` / ``width_multiple`` scaling, ``backbone``
+ ``head`` lists of ``[from, repeat, module, args, {kwargs}]`` rows, and the
kindle module vocabulary. The result is a single flax.linen module that
executes the layer graph with NHWC activations and static shapes.

Key differences from the torch reference (deliberate, TPU-first):
  - The network is one jit-compiled pure function; "fuse" is a parameter
    transformation (:func:`fuse_params`), not module surgery.
  - Strides are inferred once at build time via ``jax.eval_shape`` (no real
    forward), then baked into the head as compile-time constants.
  - Raw head maps are (bs, ny, nx, na, no) channels-last.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ayolov2_tpu.models import layers as L
from ayolov2_tpu.models.yolo_head import YOLOHead
from ayolov2_tpu.utils.general import make_divisible
from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One node of the model graph (one YAML row, post-scaling)."""

    index: int
    from_idx: Tuple[int, ...]  # absolute or -1-relative source indices
    module: str
    args: Tuple[Any, ...]
    kwargs: Tuple[Tuple[str, Any], ...]  # frozen dict
    repeat: int
    out_channels: int

    def kw(self) -> Dict[str, Any]:
        return dict(self.kwargs)


def _freeze(obj: Any) -> Any:
    """Recursively convert lists to tuples so specs are hashable."""
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(o) for o in obj)
    return obj


_KNOWN_MODULES = {
    "Conv", "Bottleneck", "C3", "SPP", "SPPF", "Focus", "UpSample", "Concat",
    "YOLOHead", "MV2Block", "MobileViTBlock", "GlobalAvgPool", "Flatten", "Linear",
}
# Modules whose first positional arg is an output-channel count that gets
# width-multiple scaling (kindle/YOLOv5 convention).
_WIDTH_SCALED = {"Conv", "C3", "SPP", "SPPF", "Focus", "MV2Block"}
# Modules whose repeat count gets depth-multiple scaling.
_DEPTH_SCALED = {"C3", "Bottleneck", "MV2Block", "MobileViTBlock"}


def parse_model_config(cfg: Union[str, Dict[str, Any]]) -> Dict[str, Any]:
    if isinstance(cfg, (str,)):
        with open(cfg, encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
    return cfg


def _build_specs(cfg: Dict[str, Any]) -> Tuple[List[LayerSpec], List[int], Optional[int]]:
    """Parse YAML rows into LayerSpecs with channel bookkeeping.

    Returns (specs, save_indices, head_index). head_index is the YOLOHead row
    (None for classification/repr graphs like simclr.yaml).
    """
    gd = float(cfg.get("depth_multiple", 1.0))
    gw = float(cfg.get("width_multiple", 1.0))
    in_ch = int(cfg.get("input_channel", 3))

    rows = list(cfg["backbone"]) + list(cfg.get("head", []))
    channels: List[int] = [in_ch]  # channels[i+1] = out channels of layer i
    specs: List[LayerSpec] = []
    save: set = set()
    head_index: Optional[int] = None

    for i, row in enumerate(rows):
        frm, rep, mod, args = row[0], row[1], row[2], list(row[3]) if len(row) > 3 else []
        kwargs = dict(row[4]) if len(row) > 4 else {}
        frm_list = frm if isinstance(frm, list) else [frm]
        if mod not in _KNOWN_MODULES:
            raise ValueError(f"Unknown module type in model YAML (row {i}): {mod!r}")

        n = max(round(rep * gd), 1) if (rep > 1 and mod in _DEPTH_SCALED) else rep

        def src_ch(f: int) -> int:
            return channels[i + f + 1] if f < 0 else channels[f + 1]

        c_out: int
        if mod in _WIDTH_SCALED:
            c_out = make_divisible(args[0] * gw, 8)
            args[0] = c_out
        elif mod == "Concat":
            c_out = sum(src_ch(f) for f in frm_list)
        elif mod == "YOLOHead":
            head_index = i
            c_out = 0
        elif mod == "Linear":
            c_out = int(args[0])
        else:  # UpSample, GlobalAvgPool, Flatten, MobileViTBlock, ...
            c_out = src_ch(frm_list[0])

        for f in frm_list:
            if f != -1:
                save.add(f if f >= 0 else i + f)

        specs.append(
            LayerSpec(
                index=i,
                from_idx=tuple(frm_list),
                module=mod,
                args=_freeze(tuple(args)),
                kwargs=tuple(sorted((k, _freeze(v)) for k, v in kwargs.items())),
                repeat=n,
                out_channels=c_out,
            )
        )
        channels.append(c_out)

    return specs, sorted(save), head_index


def _make_module(spec: LayerSpec, dtype, fuse: bool, name: str, s2d: Any = False, quant: Any = False) -> nn.Module:
    """Instantiate the flax module for a (non-head) layer spec."""
    a, kw = spec.args, spec.kw()
    act = kw.get("activation", "SiLU" if spec.module in _WIDTH_SCALED else None)
    m = spec.module
    if m == "Conv":
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        p = a[3] if len(a) > 3 else None
        return L.ConvBnAct(a[0], k, s, p, act=act, dtype=dtype, fuse=fuse, quant=quant, s2d=s2d, name=name)
    if m == "Bottleneck":
        return L.Bottleneck(a[0], a[1] if len(a) > 1 else True, act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "C3":
        shortcut = a[1] if len(a) > 1 else True
        return L.C3(a[0], n=spec.repeat, shortcut=shortcut, act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "SPP":
        return L.SPP(a[0], tuple(a[1]) if len(a) > 1 else (5, 9, 13), act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "SPPF":
        return L.SPPF(a[0], a[1] if len(a) > 1 else 5, act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "Focus":
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        return L.Focus(a[0], k, s, act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "UpSample":
        return L.UpSample(int(a[1]) if len(a) > 1 and a[1] else 2, name=name)
    if m == "MV2Block":
        return L.MV2Block(a[0], a[1] if len(a) > 1 else 1, a[2] if len(a) > 2 else 4, act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "MobileViTBlock":
        return L.MobileViTBlock(a[0], a[1], a[2], act=act, dtype=dtype, fuse=fuse, quant=quant, name=name)
    if m == "GlobalAvgPool":
        return L.GlobalAvgPool(name=name)
    if m == "Flatten":
        return L.Flatten(name=name)
    if m == "Linear":
        return L.Linear(a[0], act=act, dtype=dtype, name=name)
    raise ValueError(f"Unknown module type: {m}")


class YOLOModel(nn.Module):
    """The full layer graph as one flax module.

    Forward contract (parity with kindle YOLOModel, SURVEY.md §2.2):
      - detection graphs: training=True -> list of nl raw maps
        (bs, ny, nx, na, 5+nc); training=False -> (decoded, raw_maps).
      - headless graphs (e.g. simclr.yaml): the final tensor.
    """

    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    head_index: Optional[int]
    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[float, ...]
    dtype: Any = jnp.float32
    fused: bool = False
    out_xyxy: bool = False
    # Tucker-2 decomposition map: ((module_path, (rank_in, rank_out)), ...)
    # — mapped ConvBnActs trace as 1x1 -> kxk -> 1x1 stacks (decomposition.py
    # parity); installed for the trace via layers.decompose_scope.
    decompose_map: Tuple[Tuple[str, Tuple[int, int]], ...] = ()
    # compute a 6x6/s2 stem via space-to-depth (layers._S2DConv): exact same
    # function + params, ~4x better MXU contraction on the cin=3 layer.
    # False | "reshape" | "slice" (True = "reshape"). Default off: measured
    # e2e on v5e, the phase rearrangement costs more than the contraction
    # win buys (see STATUS.md perf notes) — kept as an option for larger
    # models / future XLA versions.
    s2d_stem: Any = False
    # int8 serving path (reference export.py --dtype int8 parity): False |
    # "calib" (sow per-conv input absmax) | True (int8 convs; params from
    # compress/quantize.quantize_params). Requires fused=True.
    quant: Any = False
    # per-layer activation rematerialization (jax.checkpoint via nn.remat):
    # the backward pass recomputes each layer's activations instead of
    # storing them — trades ~1 extra forward of FLOPs for O(layer) live
    # activation memory, the standard XLA lever for bigger per-chip batches
    # / larger models (yolov5x@640). Training-path only; no effect on
    # inference. Enabled by the trainer via cfg train.remat.
    #   False        — store everything (XLA default)
    #   True         — full per-layer remat (max memory win, ~1 extra fwd)
    #   "save_convs" — selective policy: conv (MXU) outputs are SAVED via
    #                  checkpoint_name tags; only the cheap elementwise /
    #                  normalization work (BN, SiLU, concat) is recomputed.
    #                  TPU-native middle point: never re-pay matrix-unit
    #                  FLOPs, still drops the between-conv activations.
    remat: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False, start_layer: int = 0):
        import contextlib

        tag = (
            L.remat_tag_scope()
            if (self.remat == "save_convs" and training)
            else contextlib.nullcontext()
        )
        with L.decompose_scope(dict(self.decompose_map)), tag:
            return self._forward(x, training, start_layer)

    def _forward(self, x: jax.Array, training: bool = False, start_layer: int = 0):
        """``start_layer > 0``: ``x`` is the activation *entering* spec
        ``start_layer`` and specs before it are skipped (their params are
        simply unused by apply). Used by the fused early-network Pallas
        pipeline (ops/early_pipeline.py), which computes layers 0..3 out of
        graph; skipped layers must not feed skip connections."""
        if start_layer > 0 and any(s < start_layer for s in self.save):
            raise ValueError(
                f"start_layer={start_layer} skips saved layers {self.save}"
            )
        saved: Dict[int, jax.Array] = {}
        y: Any = x.astype(self.dtype)
        specs = self.specs[start_layer:]

        # Layer-granular remat: each module call becomes a checkpoint
        # boundary (training is baked static into the closure so module-
        # internal Python branches on it stay trace-time).
        def _call_train(mod, z):
            return mod(z, True)

        remat_call = None
        if self.remat and training:
            if self.remat == "save_convs":
                from jax.ad_checkpoint import checkpoint_policies

                remat_call = nn.remat(
                    _call_train,
                    policy=checkpoint_policies.save_only_these_names("conv_out"),
                )
            else:
                remat_call = nn.remat(_call_train)

        def run(mod, z):
            return remat_call(mod, z) if remat_call is not None else mod(z, training)

        for spec in specs:
            if spec.module == "YOLOHead":
                feats = [saved[f] if f >= 0 else y for f in spec.from_idx]
                head = YOLOHead(
                    nc=self.nc,
                    anchors=self.anchors,
                    strides=self.strides,
                    out_xyxy=self.out_xyxy,
                    dtype=self.dtype,
                    name=f"model_{spec.index}",
                )
                decoded, raw = head(feats, training=training)
                return raw if training else (decoded, raw)

            if len(spec.from_idx) == 1:
                f = spec.from_idx[0]
                inp = y if f == -1 else saved[f if f >= 0 else spec.index + f]
            else:  # Concat
                inp = [y if f == -1 else saved[f if f >= 0 else spec.index + f] for f in spec.from_idx]

            if spec.module == "Concat":
                y = jnp.concatenate(inp, axis=-1)
            elif spec.module == "C3":
                # repeat is folded into the module's internal bottleneck count
                y = run(_make_module(spec, self.dtype, self.fused, f"model_{spec.index}", quant=self.quant), inp)
            else:
                y = inp
                s2d = self.s2d_stem if spec.index == 0 else False
                for r in range(spec.repeat):
                    name = f"model_{spec.index}" if spec.repeat == 1 else f"model_{spec.index}_{r}"
                    y = run(_make_module(spec, self.dtype, self.fused, name, s2d=s2d, quant=self.quant), y)

            if spec.index in self.save:
                saved[spec.index] = y
        return y

    # ---- kindle-parity attribute surface -------------------------------
    @property
    def head(self) -> Optional[YOLOHead]:
        if self.head_index is None:
            return None
        return YOLOHead(nc=self.nc, anchors=self.anchors, strides=self.strides, dtype=self.dtype)

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2 if self.anchors else 0

    @property
    def stride(self) -> np.ndarray:
        return np.asarray(self.strides)


def build_model(
    cfg: Union[str, Dict[str, Any]],
    dtype: Any = jnp.float32,
    fused: bool = False,
    out_xyxy: bool = False,
    nc: Optional[int] = None,
    decompose_map: Any = (),
    s2d_stem: Any = False,
    quant: Any = False,
    remat: Any = False,
) -> YOLOModel:
    """Build a YOLOModel from a model YAML path or dict.

    ``nc`` overrides the YAML's n_classes (the data-config nc wins at train
    time, parity: scripts/utils/model_manager.py:204-260).
    ``s2d_stem``: compute a 6x6/s2 first conv via space-to-depth — exact
    same function and parameter tree, ~4x better MXU utilization on the
    cin=3 stem (the serving path's worst layer).
    """
    cfg = parse_model_config(cfg)
    specs, save, head_index = _build_specs(cfg)
    anchors = _freeze(cfg.get("anchors", ()))
    n_classes = int(nc if nc is not None else cfg.get("n_classes", 80))

    strides: Tuple[float, ...] = ()
    if head_index is not None:
        strides = _infer_strides(specs, save, head_index, anchors, n_classes, cfg)
        LOGGER.info("Built detection model: strides=%s nc=%d", strides, n_classes)

    if isinstance(decompose_map, dict):
        decompose_map = tuple(sorted((k, (int(v[0]), int(v[1]))) for k, v in decompose_map.items()))
    return YOLOModel(
        specs=tuple(specs),
        save=tuple(save),
        head_index=head_index,
        nc=n_classes,
        anchors=anchors,
        strides=strides,
        dtype=dtype,
        fused=fused,
        out_xyxy=out_xyxy,
        decompose_map=tuple(decompose_map),
        s2d_stem=s2d_stem,
        quant=quant,
        remat=remat,
    )


def _infer_strides(specs, save, head_index, anchors, nc, cfg) -> Tuple[float, ...]:
    """Shape-only forward (jax.eval_shape) to find each head level's stride."""
    probe = YOLOModel(
        specs=tuple(specs),
        save=tuple(save),
        head_index=head_index,
        nc=nc,
        anchors=anchors,
        strides=tuple(8.0 * 2 ** i for i in range(len(anchors))),  # placeholder
        dtype=jnp.float32,
    )
    size = 256
    in_ch = int(cfg.get("input_channel", 3))
    dummy = jax.ShapeDtypeStruct((1, size, size, in_ch), jnp.float32)

    out_shapes = jax.eval_shape(
        lambda d: probe.init_with_output(jax.random.PRNGKey(0), d, training=True)[0], dummy
    )
    return tuple(float(size / s.shape[1]) for s in out_shapes)


def init_model(model: YOLOModel, rng: jax.Array, img_size: int = 640, in_ch: int = 3):
    """Initialize variables with a dummy batch; returns the variables dict."""
    dummy = jnp.zeros((1, img_size, img_size, in_ch), model.dtype)
    return model.init(rng, dummy, training=True)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def fuse_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold BatchNorm into preceding convs: the TPU-native ``model.fuse()``.

    Takes ``{'params': ..., 'batch_stats': ...}`` from the unfused model and
    returns ``{'params': ...}`` for the same model built with ``fused=True``.
    W' = W * gamma / sqrt(var + eps); b' = beta - gamma * mean / sqrt(var + eps).
    (Parity: reference model.fuse() used at val.py:331.)
    """
    eps = 1e-3
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Dict[str, Any], s: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        keys = set(p.keys())
        conv_key = "conv" if "conv" in keys else ("conv_last" if "conv_last" in keys else None)
        if conv_key is not None and "bn" in keys:
            kernel = p[conv_key]["kernel"]
            gamma = p["bn"]["scale"]
            beta = p["bn"]["bias"]
            mean = s["bn"]["mean"]
            var = s["bn"]["var"]
            scale = gamma / jnp.sqrt(var + eps)
            out[conv_key] = {
                "kernel": kernel * scale.reshape(1, 1, 1, -1),
                "bias": beta - mean * scale,
            }
            keys -= {conv_key, "bn"}
        for k in keys:
            if isinstance(p[k], dict):
                out[k] = walk(p[k], s.get(k, {}))
            else:
                out[k] = p[k]
        return out

    return {"params": walk(params, stats)}


def model_summary(model: YOLOModel, variables) -> str:
    n = count_params(variables["params"])
    return json.dumps(
        {
            "layers": len(model.specs),
            "params": n,
            "strides": list(model.strides),
            "nc": model.nc,
        }
    )

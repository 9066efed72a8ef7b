"""YOLOv5-family building blocks as flax.linen modules (NHWC, bf16 compute).

Re-derivation of the kindle module vocabulary exercised by the reference's
model YAMLs (SURVEY.md §2.2; res/configs/model/*.yaml): Conv, Bottleneck, C3,
SPP, SPPF, Focus, UpSample, Concat, MV2Block, MobileViTBlock, GlobalAvgPool,
Flatten, Linear. Architecture semantics follow the public YOLOv5 / MobileNetV2
/ MobileViT papers — not the reference's torch code.

TPU-first design notes:
  - NHWC everywhere: channels-last is the native TPU conv layout; the MXU
    contracts over the trailing (channel) dimension without relayout copies.
  - Params are fp32; compute dtype is configurable (bf16 by default in the
    builder) so convs hit the MXU at full rate while BN stats stay fp32.
  - BatchNorm carries eps=1e-3, momentum=0.97 (flax convention; equals the
    torch momentum 0.03 used by YOLOv5) so imported torch weights validate.
  - All ops are shape-static and jit-friendly; no Python control flow on
    traced values.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

ACTIVATIONS = {
    "SiLU": jax.nn.silu,
    "Swish": jax.nn.silu,
    "ReLU": jax.nn.relu,
    "ReLU6": lambda x: jnp.clip(x, 0.0, 6.0),
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.1),
    "Hardswish": jax.nn.hard_swish,
    "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Identity": lambda x: x,
    None: lambda x: x,
}


def get_activation(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    if callable(name):
        return name
    return ACTIVATIONS[name]


def autopad(k: int, p: Optional[int] = None) -> int:
    """'same'-style padding for odd kernels (YOLOv5 autopad convention)."""
    return k // 2 if p is None else p


# --- tensor-decomposition support -------------------------------------------
# A thread-local map {module path "a/b/c": (rank_in, rank_out)} consulted by
# ConvBnAct: mapped convs trace as a Tucker-2 1x1 -> kxk -> 1x1 stack
# (scripts/tensor_decomposition/decomposition.py:363-424 parity). YOLOModel
# installs the map for the duration of its trace.
import threading as _threading

_DECOMP = _threading.local()


class decompose_scope:
    """Context manager installing the active decompose map during tracing."""

    def __init__(self, mapping) -> None:
        self.mapping = dict(mapping) if mapping else {}

    def __enter__(self):
        self.prev = getattr(_DECOMP, "map", {})
        _DECOMP.map = self.mapping
        return self

    def __exit__(self, *exc):
        _DECOMP.map = self.prev
        return False


def active_decompose_map() -> dict:
    return getattr(_DECOMP, "map", {})


class remat_tag_scope:
    """Trace-scope that makes ConvBnAct tag its conv outputs for the
    ``remat="save_convs"`` policy (builder.YOLOModel).

    The tags (``jax.ad_checkpoint.checkpoint_name``) are trace-time
    metadata consumed by ``save_only_these_names``; they are only inserted
    inside this scope so every other path (serving, export, Pallas A/B)
    traces byte-identical jaxprs to before."""

    def __enter__(self):
        self.prev = getattr(_DECOMP, "remat_tags", False)
        _DECOMP.remat_tags = True
        return self

    def __exit__(self, *exc):
        _DECOMP.remat_tags = self.prev
        return False


def _maybe_tag_conv_out(x: jax.Array) -> jax.Array:
    if getattr(_DECOMP, "remat_tags", False):
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "conv_out")
    return _maybe_tp_constrain(x)


class tp_scope:
    """Trace-scope that constrains conv activations to the tensor-parallel
    layout ``P(data, None, None, model)`` (parallel.mesh.tp_sharding).

    Entered by the train step while tracing under a 2-D (data, model) mesh;
    every other path (serving, eval, export) traces without constraints and
    stays mesh-agnostic. Activations whose batch/channel dims don't divide
    the mesh axes are left unconstrained (the partitioner decides)."""

    def __init__(self, mesh, data_axis: str = "data", model_axis: str = "model"):
        self.cfg = (mesh, data_axis, model_axis)

    def __enter__(self):
        self.prev = getattr(_DECOMP, "tp_cfg", None)
        _DECOMP.tp_cfg = self.cfg
        return self

    def __exit__(self, *exc):
        _DECOMP.tp_cfg = self.prev
        return False


def _maybe_tp_constrain(x: jax.Array) -> jax.Array:
    cfg = getattr(_DECOMP, "tp_cfg", None)
    if cfg is None or x.ndim != 4:
        return x
    mesh, data_axis, model_axis = cfg
    nd, nm = int(mesh.shape[data_axis]), int(mesh.shape[model_axis])
    if x.shape[0] % nd != 0 or x.shape[-1] % nm != 0 or x.shape[-1] < nm:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(data_axis, None, None, model_axis))
    )


class _S2DConv(nn.Module):
    """The stem 6x6/s2/p2 conv computed as space-to-depth + 3x3/s1 VALID.

    Mathematically identical to the plain conv (the kernel is rearranged at
    trace time; same parameter tree: <name>/kernel (6,6,cin,f) [+ bias]),
    but the MXU contraction sees 4*cin input channels instead of cin — the
    stem's cin=3 is the single worst MXU-utilization point of the whole
    serving graph (XLA lowers small-cin convs at ~2% utilization;
    CLAUDE.md perf notes). This is the inverse of YOLOv5's old Focus
    module: v5 replaced Focus with the 6x6 conv for GPUs; on TPU the
    s2d form wins.
    """

    features: int
    dtype: Dtype = jnp.float32
    use_bias: bool = False
    # "reshape": 4-phase space-to-depth via 6D reshape + transpose;
    # "slice": phases via strided slices + channel concat (DO NOT use on
    #   the axon v5e toolchain — faults the TPU worker at full size);
    # "im2col": explicit conv_general_dilated_patches + one dense matmul —
    #   contracts K = 36*cin on the MXU instead of K = cin (measured 21%
    #   faster than XLA's native small-cin conv lowering on v5e)
    mode: str = "reshape"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode == "slice" and jax.default_backend() == "tpu":
            # Twice-reproduced kernel fault: slice mode at (32,640,640,3)
            # crashes/hangs the TPU worker on this toolchain (minutes of
            # recovery). A config value must never be able to fault the
            # worker, so this is a hard error, not a warning.
            raise ValueError(
                "s2d_stem='slice' faults the TPU worker on this toolchain "
                "(see models/layers.py s2d notes); use 'reshape'/'im2col' "
                "or s2d_stem=False on TPU backends"
            )
        x = x.astype(self.dtype)
        cin = x.shape[-1]
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, "s2d stem needs even H/W"
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (6, 6, cin, self.features), jnp.float32
        )
        if self.mode == "im2col":
            p = jax.lax.conv_general_dilated_patches(
                x, (6, 6), (2, 2), [(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (n, h/2, w/2, cin*36), channel order (c, kh, kw)
            k = kernel.astype(self.dtype).transpose(2, 0, 1, 3).reshape(36 * cin, self.features)
            y = jnp.einsum("bhwc,cf->bhwf", p, k)
        else:
            # K'[a, b, (p, q, c), o] = K[2a + p, 2b + q, c, o]
            k = kernel.reshape(3, 2, 3, 2, cin, self.features)
            k = k.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * cin, self.features)
            k = k.astype(self.dtype)

            n, h, w, _ = x.shape
            x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
            hp, wp = h + 4, w + 4
            if self.mode == "slice":
                # channel order (p, q, c) matches the kernel rearrangement above
                x = jnp.concatenate(
                    [x[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1
                )
            else:
                x = x.reshape(n, hp // 2, 2, wp // 2, 2, cin)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * cin)

            y = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class _QuantConv(nn.Module):
    """Symmetric per-channel int8 conv: s8 x s8 -> s32 on the MXU.

    The TPU-native analogue of the reference's TensorRT int8 engine path
    (scripts/model_converter/model_converter.py:147-260 — int8 builder flag
    + IInt8EntropyCalibrator2). v5e runs int8 MXU contractions at 2x the
    bf16 rate, so the conv-bound serving backbone is the win surface.

    Parameter tree (scope name "conv", mirroring the fused conv so
    compress/quantize.quantize_params is a pure tree transform):
      q_kernel (k,k,cin,f) int8   — round(W / w_scale), symmetric
      w_scale  (f,)        f32    — per-out-channel absmax(W)/127
      in_scale ()          f32    — calibrated input absmax (per-tensor)
      bias     (f,)        f32    — carried over from the BN-fused conv
    Dequant folds into one scalar per channel: y = acc_s32 * (w_scale *
    in_scale/127) + bias — an elementwise epilogue XLA fuses into the conv.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    pad: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        k = self.kernel_size
        q_kernel = self.param(
            "q_kernel", nn.initializers.zeros, (k, k, cin, self.features), jnp.int8
        )
        w_scale = self.param("w_scale", nn.initializers.ones, (self.features,), jnp.float32)
        in_scale = self.param("in_scale", nn.initializers.ones, (), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        s_in = in_scale / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_in), -127.0, 127.0
        ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq,
            q_kernel,
            window_strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad), (self.pad, self.pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (w_scale * s_in)
        return (y + bias).astype(self.dtype)


def _quantizable(cin: int, groups: int, ranks, fuse: bool) -> bool:
    """Whether a plain conv takes the int8 path under quant mode.

    The rule must be computable both here (from the traced input) and in
    compress/quantize.quantize_params (from the fused kernel shape alone):
    plain fused convs with cin > 4. That excludes the cin=3 stem (negligible
    FLOPs, quality-sensitive), depthwise convs (kernel cin-dim is 1), and
    Tucker-decomposed stacks; YOLOHead's convs live outside ConvBnAct and
    stay bf16 (standard detector PTQ practice, matching TRT's behavior of
    keeping the plugin/head path in float).
    """
    return fuse and groups == 1 and ranks is None and cin > 4


class ConvBnAct(nn.Module):
    """Conv2d + BatchNorm + activation — the universal YOLOv5 'Conv' block.

    ``fuse``: when True the BatchNorm is folded into the conv (kernel/bias
    transformed offline by :func:`ayolov2_tpu.models.builder.fuse_params`)
    and this module runs conv+bias+act only — the TPU-native analogue of the
    reference's ``model.fuse()`` (used at val.py:331).

    When this module's path is in the active decompose map, the conv traces
    as three convs (1x1 rank_in, kxk rank_in->rank_out, 1x1 features) — the
    Tucker-2 decomposed form.

    ``quant``: False (off) | "calib" (normal compute, sow per-conv input
    absmax into the "quant_stats" collection) | True (int8 inference via
    :class:`_QuantConv`; params installed by compress/quantize).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    # stem-only MXU optimization: compute a 6x6/s2/p2 conv via space-to-
    # depth (see _S2DConv); exact same function and parameter tree.
    # False = plain conv; "reshape" / "slice" (or True = "reshape") pick the
    # phase-materialization strategy.
    s2d: Any = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        p = autopad(self.kernel_size, self.padding)
        ranks = active_decompose_map().get("/".join(self.path))
        if (
            self.s2d and ranks is None and self.kernel_size == 6
            and self.stride == 2 and p == 2 and self.groups == 1
        ):
            mode = "reshape" if self.s2d is True else str(self.s2d)
            x = _S2DConv(self.features, dtype=self.dtype, use_bias=self.fuse,
                         mode=mode, name="conv")(x)
            if not self.fuse:
                x = nn.BatchNorm(
                    use_running_average=not training, momentum=0.97, epsilon=1e-3,
                    dtype=self.dtype, param_dtype=jnp.float32, name="bn",
                )(x)
            return get_activation(self.act)(x)
        if ranks is not None:
            if self.groups != 1:
                raise ValueError(f"cannot decompose grouped conv at {self.path}")
            r_in, r_out = ranks
            x = nn.Conv(
                int(r_in), (1, 1), use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name="conv_first",
            )(x)
            x = _maybe_tag_conv_out(x)
            x = nn.Conv(
                int(r_out),
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)],
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv_core",
            )(x)
            x = _maybe_tag_conv_out(x)
            x = nn.Conv(
                self.features, (1, 1), use_bias=self.fuse,
                dtype=self.dtype, param_dtype=jnp.float32, name="conv_last",
            )(x)
            x = _maybe_tag_conv_out(x)
        else:
            if self.quant is True and _quantizable(x.shape[-1], self.groups, ranks, self.fuse):
                x = _QuantConv(
                    self.features, self.kernel_size, self.stride, p,
                    dtype=self.dtype, name="conv",
                )(x)
                return get_activation(self.act)(x)
            if self.quant == "calib" and _quantizable(
                x.shape[-1], self.groups, ranks, self.fuse
            ):
                ax = jnp.abs(x.astype(jnp.float32))
                self.sow(
                    "quant_stats",
                    "in_absmax",
                    jnp.max(ax),
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                    reduce_fn=jnp.maximum,
                )
                # p99.9 of |x| on a strided subsample (<=1M elements keeps the
                # calibration sort cheap): the clipped-range alternative to
                # absmax — TRT's entropy calibrator analogue, selected via
                # quantize_params(method="p999")
                flat = ax.reshape(-1)
                step = max(1, flat.shape[0] // (1 << 20))
                self.sow(
                    "quant_stats",
                    "in_p999",
                    jnp.percentile(flat[::step], 99.9),
                    init_fn=lambda: jnp.zeros((), jnp.float32),
                    reduce_fn=jnp.maximum,
                )
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(p, p), (p, p)],
                feature_group_count=self.groups,
                use_bias=self.fuse,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
            x = _maybe_tag_conv_out(x)
        if not self.fuse:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return get_activation(self.act)(x)


class Bottleneck(nn.Module):
    """Standard YOLOv5 bottleneck: 1x1 -> 3x3 with optional residual."""

    features: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        c_hidden = int(self.features * self.expansion)
        y = ConvBnAct(c_hidden, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv1")(x, training)
        y = ConvBnAct(
            self.features, 3, 1, groups=self.groups, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv2"
        )(y, training)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (YOLOv5 C3)."""

    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        c_ = int(self.features * self.expansion)
        y1 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv1")(x, training)
        for i in range(self.n):
            y1 = Bottleneck(
                c_, self.shortcut, self.groups, 1.0, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name=f"m{i}"
            )(y1, training)
        y2 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv2")(x, training)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.features, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv3")(y, training)


def _max_pool_same(x: jax.Array, k: int) -> jax.Array:
    """k x k max pool, stride 1, same padding (NHWC)."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


class SPP(nn.Module):
    """Spatial pyramid pooling (parallel max pools, yolov5_v5.yaml:34)."""

    features: int
    kernels: Sequence[int] = (5, 9, 13)
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv1")(x, training)
        pools = [x] + [_max_pool_same(x, k) for k in self.kernels]
        y = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.features, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv2")(y, training)


class SPPF(nn.Module):
    """Fast SPP: 3 cascaded max pools equivalent to SPP(5,9,13)."""

    features: int
    kernel: int = 5
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv1")(x, training)
        y1 = _max_pool_same(x, self.kernel)
        y2 = _max_pool_same(y1, self.kernel)
        y3 = _max_pool_same(y2, self.kernel)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.features, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="cv2")(y, training)


class Focus(nn.Module):
    """Space-to-depth 2x2 slicing + Conv (legacy YOLOv5 stem, yolov5_v5.yaml:21)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        # torch order: [::2, ::2], [1::2, ::2], [::2, 1::2], [1::2, 1::2] over (h, w)
        y = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBnAct(
            self.features, self.kernel_size, self.stride, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="conv"
        )(y, training)


class UpSample(nn.Module):
    """Nearest-neighbor upsample by integer factor (torch nn.Upsample analogue)."""

    scale: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        # repeat is cheaper than jax.image.resize for integer nearest upsampling
        x = jnp.repeat(x, self.scale, axis=1)
        return jnp.repeat(x, self.scale, axis=2)


class MV2Block(nn.Module):
    """MobileNetV2 inverted residual (arXiv:1801.04381; yolov5_mobilevit.yaml)."""

    features: int
    stride: int = 1
    expansion: int = 4
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        c_in = x.shape[-1]
        hidden = int(round(c_in * self.expansion))
        y = x
        if self.expansion != 1:
            y = ConvBnAct(hidden, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="expand")(y, training)
        y = ConvBnAct(
            hidden, 3, self.stride, groups=hidden, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="depthwise"
        )(y, training)
        y = ConvBnAct(self.features, 1, 1, act=None, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="project")(y, training)
        if self.stride == 1 and c_in == self.features:
            y = x + y
        return y


class _TransformerBlock(nn.Module):
    """Pre-norm transformer encoder block for MobileViT."""

    dim: int
    mlp_dim: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, param_dtype=jnp.float32, name="attn"
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = jax.nn.silu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        return x + y


class MobileViTBlock(nn.Module):
    """MobileViT block (arXiv:2110.02178): local conv rep + global transformer.

    Args follow the reference YAML contract `[conv_channel, mlp_channel, depth]`
    (yolov5_mobilevit.yaml:27 comment); output channels == input channels.
    Patch size 2x2; requires H and W divisible by 2 (static shapes).
    """

    dim: int
    mlp_dim: int
    depth: int
    patch: int = 2
    act: Optional[str] = "SiLU"
    dtype: Dtype = jnp.float32
    fuse: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        c_in = x.shape[-1]
        # Local representation
        y = ConvBnAct(c_in, 3, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="local_conv")(x, training)
        y = ConvBnAct(self.dim, 1, 1, act=None, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="proj_in")(y, training)

        # Unfold into non-overlapping patch tokens: (B, ph*pw, H/ph*W/pw, d)
        b, h, w, d = y.shape
        ph = pw = self.patch
        y = y.reshape(b, h // ph, ph, w // pw, pw, d)
        y = y.transpose(0, 2, 4, 1, 3, 5).reshape(b, ph * pw, (h // ph) * (w // pw), d)

        for i in range(self.depth):
            y = _TransformerBlock(self.dim, self.mlp_dim, dtype=self.dtype, name=f"tr{i}")(y)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln_out")(y)

        # Fold back
        y = y.reshape(b, ph, pw, h // ph, w // pw, d).transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, d)

        y = ConvBnAct(c_in, 1, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="proj_out")(y, training)
        y = jnp.concatenate([x, y], axis=-1)
        return ConvBnAct(c_in, 3, 1, act=self.act, dtype=self.dtype, fuse=self.fuse, quant=self.quant, name="fusion")(y, training)


class GlobalAvgPool(nn.Module):
    """Global average pool to (B, 1, 1, C) (simclr.yaml:38)."""

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        return jnp.mean(x, axis=(1, 2), keepdims=True)


class Flatten(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        return x.reshape(x.shape[0], -1)


class Linear(nn.Module):
    features: int
    act: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32, name="fc")(x)
        return get_activation(self.act)(x)

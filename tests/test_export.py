"""Export tests: jax.export round-trip equivalence (test_model_convert analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ayolov2_tpu.export import export_serving, load_exported, make_serving_fn
from ayolov2_tpu.models import build_model, fuse_params, init_model

MODEL_CFG = "res/configs/model/yolov5s.yaml"


def _vars(nc=20, img=64):
    model = build_model(MODEL_CFG, dtype=jnp.float32, nc=nc)
    return init_model(model, jax.random.PRNGKey(0), img_size=img)


def test_export_roundtrip_matches_live_jit(tmp_path):
    variables = _vars()
    paths = export_serving(
        MODEL_CFG, variables, str(tmp_path / "m"), batch_size=2,
        img_size=(64, 64), nc=20, keep_top_k=10, top_k=32, half=False,
    )
    x = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)

    call = load_exported(paths["jaxexp"])
    det_exp, n_exp = call(x)

    model = build_model(MODEL_CFG, dtype=jnp.float32, fused=True, nc=20)
    fused = fuse_params(variables)
    serve = make_serving_fn(model, fused, keep_top_k=10, top_k=32, image_dtype=jnp.float32)
    det_live, n_live = jax.jit(serve)(jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(det_exp), np.asarray(det_live), atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(n_exp), np.asarray(n_live))


def test_export_artifacts_and_sidecar(tmp_path):
    variables = _vars()
    paths = export_serving(
        MODEL_CFG, variables, str(tmp_path / "m"), batch_size=1,
        img_size=(64, 64), nc=20, keep_top_k=5, top_k=16, half=False,
        conf_thres=0.25, iou_thres=0.5,
    )
    sidecar = yaml.safe_load(open(paths["yaml"]))
    assert sidecar["conf_t"] == 0.25 and sidecar["iou_t"] == 0.5
    assert sidecar["input"]["shape"] == [1, 64, 64, 3]
    assert sidecar["outputs"][0]["shape"] == [1, 5, 6]
    # raw StableHLO must be non-trivial and start with the MLIR bytecode magic
    hlo = open(paths["stablehlo"], "rb").read()
    assert len(hlo) > 10_000
    assert hlo[:4] == b"ML\xefR", hlo[:4]


def test_export_raw_head(tmp_path):
    variables = _vars()
    paths = export_serving(
        MODEL_CFG, variables, str(tmp_path / "raw"), batch_size=1,
        img_size=(64, 64), nc=20, include_nms=False, half=False,
    )
    call = load_exported(paths["jaxexp"])
    out = call(np.zeros((1, 64, 64, 3), np.uint8))
    assert np.asarray(out).shape == (1, 252, 25)  # 64px grids: (64+16+4)*3 anchors


def test_validator_with_exported_artifact(tmp_path):
    """Validate through a loaded .jaxexp artifact (the TRT-val path analogue)."""
    from pathlib import Path

    import pytest

    from ayolov2_tpu.eval import YoloValidator

    VOC_VAL = "/root/reference/tests/res/datasets/VOC/images/val"
    if not Path(VOC_VAL).exists():
        pytest.skip("fixtures unavailable")

    from ayolov2_tpu.data import DataLoader, DetectionDataset

    variables = _vars()
    paths = export_serving(
        MODEL_CFG, variables, str(tmp_path / "m"), batch_size=4,
        img_size=(64, 64), nc=20, keep_top_k=10, top_k=32, half=False,
    )
    call = load_exported(paths["jaxexp"])

    ds = DetectionDataset(VOC_VAL, img_size=64, batch_size=4, rect=False, stride=32, n_skip=4)
    loader = DataLoader(ds, batch_size=4, pad_final_batch=True)
    v = YoloValidator(None, {}, loader, cfg={"nc": 20}, detection_fn=call)
    result = v.validation()
    assert 0.0 <= result["map50"] <= 1.0
    assert result["seen"] > 0


def test_device_letterbox_matches_host_letterbox():
    """In-graph letterbox (export variant) vs the host cv2 letterbox on a
    real fixture image: same geometry, same pad value, bilinear numerics
    within uint8 rounding (reference geometry contract
    data_loader.py:395-459)."""
    from pathlib import Path

    import cv2
    import pytest

    from ayolov2_tpu.data.datasets import letterbox
    from ayolov2_tpu.export import device_letterbox, letterbox_geometry

    VOC_TRAIN = "/root/reference/tests/res/datasets/VOC/images/train"
    imgs = sorted(Path(VOC_TRAIN).glob("*.jpg")) or sorted(Path(VOC_TRAIN).glob("*.png"))
    if not imgs:
        pytest.skip("fixtures unavailable")
    im0 = cv2.imread(str(imgs[0]))[:, :, ::-1]  # BGR->RGB like the loader

    target = (320, 320)
    host, ratio, (dw, dh) = letterbox(im0, target, auto=False)
    dev = np.asarray(
        jax.jit(
            lambda x: device_letterbox(x, im0.shape[:2], target),
            static_argnums=(),
        )(jnp.asarray(im0[None]))
    )[0]

    # geometry: the static helper reproduces the host's ratio/pad exactly
    r, new_unpad_hw, _, (gdw, gdh) = letterbox_geometry(im0.shape[:2], target)
    assert ratio == (r, r)
    assert (gdw, gdh) == (dw, dh)
    assert dev.shape == host.shape

    # pad regions are exactly 114 in both
    top = int(round(dh - 0.1))
    if top > 0:
        assert (dev[:top] == 114.0).all() and (host[:top] == 114).all()

    # content: bilinear half-pixel sampling matches cv2.INTER_LINEAR to
    # uint8 rounding (cv2 rounds each output pixel; jax keeps float)
    diff = np.abs(dev.astype(np.float32) - host.astype(np.float32))
    assert diff.max() <= 2.0, diff.max()
    assert diff.mean() < 0.5, diff.mean()


def test_export_raw_frame_variant_matches_host_pipeline(tmp_path):
    """VERDICT r3 task 9: the raw-frame export (in-graph letterbox +
    raw-coordinate outputs) must reproduce host-letterbox -> standard
    artifact -> scale_coords. Pad-only geometry (no resize) keeps the two
    pipelines bit-comparable, isolating the in-graph pad + de-letterbox."""
    from ayolov2_tpu.data.datasets import letterbox
    from ayolov2_tpu.utils.boxes import scale_coords

    variables = _vars()
    raw_hw, target = (48, 64), (64, 64)  # r=1: pure padding
    rng = np.random.default_rng(7)
    im0 = rng.integers(0, 255, (*raw_hw, 3), np.uint8)

    paths_raw = export_serving(
        MODEL_CFG, variables, str(tmp_path / "rawframe"), batch_size=1,
        img_size=target, nc=20, keep_top_k=10, top_k=32, half=False,
        raw_hw=raw_hw,
    )
    sidecar = yaml.safe_load(open(paths_raw["yaml"]))
    assert sidecar["on_device_letterbox"] is True
    assert sidecar["input"]["shape"] == [1, 48, 64, 3]

    det_raw, n_raw = load_exported(paths_raw["jaxexp"])(im0[None])
    det_raw, n_raw = np.asarray(det_raw), int(np.asarray(n_raw)[0])

    # host pipeline: letterbox -> standard artifact -> scale_coords
    paths_std = export_serving(
        MODEL_CFG, variables, str(tmp_path / "std"), batch_size=1,
        img_size=target, nc=20, keep_top_k=10, top_k=32, half=False,
    )
    lb, ratio, pad = letterbox(im0, target, auto=False)
    det_std, n_std = load_exported(paths_std["jaxexp"])(lb[None])
    det_std, n_std = np.asarray(det_std).copy(), int(np.asarray(n_std)[0])
    det_std[0, :, :4] = np.asarray(
        scale_coords(target, jnp.asarray(det_std[0, :, :4]), raw_hw,
                     ratio_pad=(ratio, pad))
    )

    assert n_raw == n_std
    np.testing.assert_allclose(det_raw[0, :n_raw], det_std[0, :n_std],
                               atol=1e-3, rtol=1e-4)


def test_export_half_bakes_bf16_weights(tmp_path):
    """half=True bakes bf16 weight constants — bit-identical outputs (the
    apply path casts f32 params to bf16 anyway, layers.py:133,139,159) at
    roughly half the artifact size of the f32-constant export."""
    variables = _vars()
    p16 = export_serving(
        MODEL_CFG, variables, str(tmp_path / "h"), batch_size=1,
        img_size=(64, 64), nc=20, keep_top_k=10, top_k=32, half=True,
    )
    p32 = export_serving(
        MODEL_CFG, variables, str(tmp_path / "f"), batch_size=1,
        img_size=(64, 64), nc=20, keep_top_k=10, top_k=32, half=False,
    )
    from pathlib import Path as _P

    s16, s32 = _P(p16["stablehlo"]).stat().st_size, _P(p32["stablehlo"]).stat().st_size
    assert s16 < 0.6 * s32, (s16, s32)

    # live bf16 jit with f32 params == the baked-bf16 artifact, bit for bit
    x = np.random.default_rng(1).integers(0, 255, (1, 64, 64, 3), np.uint8)
    det_exp, n_exp = load_exported(p16["jaxexp"])(x)

    model = build_model(MODEL_CFG, dtype=jnp.bfloat16, fused=True, nc=20)
    fused = fuse_params(variables)
    serve = make_serving_fn(model, fused, keep_top_k=10, top_k=32,
                            image_dtype=jnp.bfloat16, fused_decode=True,
                            img_hw=(64, 64))
    det_live, n_live = jax.jit(serve)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(det_exp), np.asarray(det_live))
    np.testing.assert_array_equal(np.asarray(n_exp), np.asarray(n_live))

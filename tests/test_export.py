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

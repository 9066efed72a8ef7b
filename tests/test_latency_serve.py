"""Spatially-partitioned (SP) low-latency serving: sharded == single-device.

DP serving scales throughput but never moves the bs-1 latency floor — one
image always runs on one chip. make_latency_serving_fn shards the image
HEIGHT axis over the mesh; XLA's SPMD partitioner rewrites every conv into
a halo-exchanged sharded conv (collective-permute over ICI), spreading a
single image's FLOPs across all chips. The GPU reference has no analogue
(one TRT engine per GPU, cpp/src/torchscript_runner/main.cpp:29-48).

Runs on the 8-device virtual CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.export import make_serving_fn
from ayolov2_tpu.models import build_model, fuse_params, init_model
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.parallel import get_mesh, make_latency_serving_fn

MODEL_CFG = "res/configs/model/yolov5s.yaml"


@pytest.fixture(scope="module")
def tiny():
    cfg = dict(parse_model_config(MODEL_CFG), depth_multiple=0.33, width_multiple=0.25)
    fused_model = build_model(cfg, dtype=jnp.float32, fused=True, nc=20)
    model = build_model(cfg, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    return cfg, fused_model, fuse_params(variables)


def test_latency_serve_matches_single_device(tiny):
    """bs1 — the latency-critical case SP exists for. H=64 over 8 chips puts
    8 rows per chip at stride 1 and forces partitioner padding at the /32
    level (2 rows over 8 devices) — the hard sharding geometry."""
    _, model, fused = tiny
    assert len(jax.devices()) == 8
    mesh = get_mesh()

    kw = dict(keep_top_k=10, top_k=32, image_dtype=jnp.float32)
    serve1 = jax.jit(make_serving_fn(model, fused, fused_decode=True, img_hw=(64, 64), **kw))
    serveSP = make_latency_serving_fn(mesh, model, fused, img_hw=(64, 64), **kw)

    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8))
    det1, n1 = serve1(x)
    detSP, nSP = serveSP(x)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(nSP))
    np.testing.assert_allclose(np.asarray(det1), np.asarray(detSP), atol=1e-5, rtol=1e-5)
    # outputs are replicated — any chip serves the full answer
    assert len(detSP.sharding.device_set) == 8
    assert detSP.sharding.is_fully_replicated


def test_latency_serve_small_batch(tiny):
    """SP shards H, not batch — any batch size works (no divisibility rule)."""
    _, model, fused = tiny
    kw = dict(keep_top_k=10, top_k=32, image_dtype=jnp.float32)
    serve1 = jax.jit(make_serving_fn(model, fused, fused_decode=True, img_hw=(64, 64), **kw))
    serveSP = make_latency_serving_fn(get_mesh(), model, fused, img_hw=(64, 64), **kw)

    x = jnp.asarray(np.random.default_rng(1).integers(0, 255, (3, 64, 64, 3), np.uint8))
    det1, n1 = serve1(x)
    detSP, nSP = serveSP(x)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(nSP))
    np.testing.assert_allclose(np.asarray(det1), np.asarray(detSP), atol=1e-5, rtol=1e-5)


def test_latency_serve_plain_decode_path(tiny):
    """The unfused (no img_hw) decode path spatially shards too."""
    _, model, fused = tiny
    kw = dict(keep_top_k=10, top_k=32, image_dtype=jnp.float32)
    serve1 = jax.jit(make_serving_fn(model, fused, **kw))
    serveSP = make_latency_serving_fn(get_mesh(), model, fused, **kw)

    x = jnp.asarray(np.random.default_rng(2).integers(0, 255, (1, 64, 64, 3), np.uint8))
    det1, n1 = serve1(x)
    detSP, nSP = serveSP(x)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(nSP))
    np.testing.assert_allclose(np.asarray(det1), np.asarray(detSP), atol=1e-5, rtol=1e-5)

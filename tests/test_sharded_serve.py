"""Multi-chip DP serving: sharded program == single-device serving outputs.

The TPU-native analogue of the reference's engine-per-GPU inference scaling
(val.py --device pinning): one jitted program over the data mesh, batch
split by XLA. Runs on the 8-device virtual CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ayolov2_tpu.export import make_serving_fn
from ayolov2_tpu.models import build_model, fuse_params, init_model
from ayolov2_tpu.models.builder import parse_model_config
from ayolov2_tpu.parallel import get_mesh, make_sharded_serving_fn

MODEL_CFG = "res/configs/model/yolov5s.yaml"


@pytest.fixture(scope="module")
def tiny():
    cfg = dict(parse_model_config(MODEL_CFG), depth_multiple=0.33, width_multiple=0.25)
    model = build_model(cfg, dtype=jnp.float32, nc=20)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    fused_model = build_model(cfg, dtype=jnp.float32, fused=True, nc=20)
    return cfg, fused_model, fuse_params(variables)


def test_sharded_serve_matches_single_device(tiny):
    _, model, fused = tiny
    assert len(jax.devices()) == 8
    mesh = get_mesh()

    kw = dict(keep_top_k=10, top_k=32, image_dtype=jnp.float32)
    serve1 = jax.jit(make_serving_fn(model, fused, fused_decode=True, img_hw=(64, 64), **kw))
    serve8 = make_sharded_serving_fn(mesh, model, fused, img_hw=(64, 64), **kw)

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (8, 64, 64, 3), np.uint8)
    )
    det1, n1 = serve1(x)
    det8, n8 = serve8(x)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n8))
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det8), atol=1e-5, rtol=1e-5)
    # outputs really are batch-sharded across the mesh
    assert len(det8.sharding.device_set) == 8


def test_sharded_serve_rejects_indivisible_batch(tiny):
    _, model, fused = tiny
    serve8 = make_sharded_serving_fn(
        get_mesh(), model, fused, keep_top_k=10, top_k=32,
        image_dtype=jnp.float32, img_hw=(64, 64),
    )
    with pytest.raises(AssertionError, match="not divisible"):
        serve8(jnp.zeros((6, 64, 64, 3), jnp.uint8))


def test_sharded_serve_int8(tiny):
    """The int8 PTQ graph shards the same way (production int8 serving)."""
    from ayolov2_tpu.compress.quantize import quantize_model

    cfg, _, fused = tiny
    rng = np.random.default_rng(1)
    calib = [jnp.asarray(rng.random((2, 64, 64, 3), np.float32))]
    qmodel, qvars = quantize_model(cfg, fused, calib, dtype=jnp.float32, nc=20)

    kw = dict(keep_top_k=10, top_k=32, image_dtype=jnp.float32)
    serve1 = jax.jit(make_serving_fn(qmodel, qvars, fused_decode=True, img_hw=(64, 64), **kw))
    serve8 = make_sharded_serving_fn(get_mesh(), qmodel, qvars, img_hw=(64, 64), **kw)

    x = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), np.uint8))
    det1, n1 = serve1(x)
    det8, n8 = serve8(x)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n8))
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det8), atol=1e-5, rtol=1e-5)


def test_serve_stream_matches_per_batch_and_is_lazy():
    """serve_stream (the TrtWrapper pipelined-H2D analogue) must be a pure
    scheduling change: per-batch results identical to calling serve_fn
    directly, yielded in order, with the input iterable consumed lazily
    (at most ``depth`` batches ahead of the yields)."""
    from ayolov2_tpu.parallel import serve_stream

    fn = jax.jit(lambda x: (x.astype(jnp.float32) * 2 + 1, jnp.sum(x, axis=(1, 2, 3))))
    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 255, (4, 8, 8, 3), np.uint8) for _ in range(5)]
    want = [fn(jnp.asarray(h)) for h in hosts]

    consumed = []

    def feeder():
        for i, h in enumerate(hosts):
            consumed.append(i)
            yield h

    got = []
    for i, out in enumerate(serve_stream(fn, feeder(), depth=2)):
        got.append(out)
        # after yield i, at most i+1 results exist and at most i+1+depth
        # inputs have been pulled (double buffering, not slurping the
        # whole stream)
        assert len(consumed) <= i + 1 + 2
    assert len(got) == len(hosts)
    for (y, ny), (w, nw) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(w))
        np.testing.assert_array_equal(np.asarray(ny), np.asarray(nw))


def test_serve_stream_depths_and_sharded_feed(tiny):
    """depth=1 (serial) and depth=3 give identical results, and the stream
    feeds a mesh-sharded serving fn when given the batch sharding."""
    from ayolov2_tpu.parallel import batch_sharding, serve_stream

    _, model, fused = tiny
    mesh = get_mesh()
    serve8 = make_sharded_serving_fn(
        mesh, model, fused, keep_top_k=10, top_k=32,
        image_dtype=jnp.float32, img_hw=(64, 64),
    )
    rng = np.random.default_rng(2)
    hosts = [rng.integers(0, 255, (8, 64, 64, 3), np.uint8) for _ in range(3)]
    want = [serve8(jnp.asarray(h)) for h in hosts]

    shard = batch_sharding(mesh, 4)
    for depth in (1, 3):
        outs = list(serve_stream(serve8, hosts, sharding=shard, depth=depth))
        assert len(outs) == len(hosts)
        for (d, n), (dw, nw) in zip(outs, want):
            np.testing.assert_array_equal(np.asarray(n), np.asarray(nw))
            np.testing.assert_allclose(
                np.asarray(d), np.asarray(dw), atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="depth"):
        list(serve_stream(serve8, hosts, depth=0))

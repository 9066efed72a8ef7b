"""Device-level tracing hooks (utils/profiling).

The reference's tracing story is host wall-clock only (TimeChecker,
scripts/utils/general.py:394-516); this module adds jax.profiler device
traces. These tests pin the contract: zero-overhead no-ops when
AYOLO_TRACE_DIR is unset, and real profile bundles on disk when set.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from ayolov2_tpu.utils.profiling import StepWindowTracer, maybe_trace, trace_dir


def _profile_bundles(root):
    """xprof writes plugins/profile/<ts>/ bundles under the trace dir."""
    hits = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if os.sep + os.path.join("plugins", "profile") in dirpath and filenames:
            hits.append(dirpath)
    return hits


def test_disabled_is_noop(monkeypatch):
    monkeypatch.delenv("AYOLO_TRACE_DIR", raising=False)
    assert trace_dir() is None
    assert trace_dir("val") is None
    with maybe_trace("val") as active:
        assert active is False
    tracer = StepWindowTracer("train")
    for i in range(10):
        tracer.step(i)  # must never start a trace
    tracer.close()


def test_maybe_trace_writes_bundle(tmp_path, monkeypatch):
    monkeypatch.setenv("AYOLO_TRACE_DIR", str(tmp_path))
    f = jax.jit(lambda x: x * 2 + 1)
    with maybe_trace("val") as active:
        assert active is True
        jax.block_until_ready(f(jnp.ones((8, 8))))
    assert (tmp_path / "val").is_dir()
    assert _profile_bundles(tmp_path / "val"), "no xprof bundle written"


def test_step_window_tracer(tmp_path, monkeypatch):
    monkeypatch.setenv("AYOLO_TRACE_DIR", str(tmp_path))
    monkeypatch.setenv("AYOLO_TRACE_STEPS", "2")
    f = jax.jit(lambda x: jnp.sum(x * x))
    tracer = StepWindowTracer("train")
    for i in range(8):
        tracer.step(i)  # starts at step 2, stops at step 4
        jax.block_until_ready(f(jnp.ones((4, 4))))
    assert tracer._done and not tracer._active
    tracer.close()  # idempotent after the window closed
    assert _profile_bundles(tmp_path / "train"), "no xprof bundle written"


def test_step_window_close_mid_window(tmp_path, monkeypatch):
    # training shorter than the window: close() must stop the open trace
    monkeypatch.setenv("AYOLO_TRACE_DIR", str(tmp_path))
    monkeypatch.setenv("AYOLO_TRACE_STEPS", "100")
    tracer = StepWindowTracer("short")
    tracer.step(2)
    assert tracer._active
    jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(4)))
    tracer.close()
    assert tracer._done and not tracer._active
    assert _profile_bundles(tmp_path / "short"), "no xprof bundle written"

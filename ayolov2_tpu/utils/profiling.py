"""Device-level tracing hooks (SURVEY §5 "Tracing / profiling").

The reference's instrumentation is host wall-clock only: ``TimeChecker``
named segments (scripts/utils/general.py:394-516) and the pre/infer/NMS
ms/img trio (scripts/utils/train_utils.py:424-470) — both re-created here
(utils/general.TimeChecker, eval/validator timing). This module adds the
TPU-native layer the reference cannot have: ``jax.profiler`` traces with
XLA op-level device timelines, viewable in TensorBoard/xprof or Perfetto.

Zero overhead unless enabled:

    AYOLO_TRACE_DIR=/tmp/trace python bench.py          # serve loop
    AYOLO_TRACE_DIR=/tmp/trace python cli/val.py ...    # validation loop
    AYOLO_TRACE_DIR=/tmp/trace AYOLO_TRACE_STEPS=4 python cli/train.py ...
        # traces train steps 2..5 of the first epoch (a bounded window —
        # a whole-epoch trace would be gigabytes)

Each enabled phase writes a ``plugins/profile/<ts>`` bundle under its own
subdirectory of AYOLO_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path
from typing import Iterator, Optional


def trace_dir(sub: str = "") -> Optional[str]:
    """The AYOLO_TRACE_DIR target for a phase, or None when tracing is off."""
    root = os.environ.get("AYOLO_TRACE_DIR", "")
    if not root:
        return None
    path = Path(root) / sub if sub else Path(root)
    path.mkdir(parents=True, exist_ok=True)
    return str(path)


@contextlib.contextmanager
def maybe_trace(sub: str = "") -> Iterator[bool]:
    """Wrap a block in ``jax.profiler.trace`` when AYOLO_TRACE_DIR is set.

    Yields True when tracing is active (callers may log the artifact path).
    Fail-soft: tracing is diagnostics — a backend without profiler support
    (e.g. a PJRT plugin that doesn't implement the profiler extension) must
    degrade to a warning, never kill the traced run.
    """
    target = trace_dir(sub)
    if target is None:
        yield False
        return
    import jax

    try:
        jax.profiler.start_trace(target)
    except Exception as e:
        _warn_once(f"jax.profiler unavailable on this backend ({e!r}); tracing skipped")
        yield False
        return
    try:
        yield True
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:
            _warn_once(f"stopping jax.profiler trace failed ({e!r})")


_warned = False


def _warn_once(msg: str) -> None:
    global _warned
    if not _warned:
        from ayolov2_tpu.utils.logger import get_logger

        get_logger(__name__).warning(msg)
        _warned = True


class StepWindowTracer:
    """Trace a bounded window of training steps (AYOLO_TRACE_STEPS, default 4).

    Call :meth:`step` once per training step with the global step index;
    the trace starts at step 2 (past the compile+warmup dispatches, which
    would dominate the timeline) and stops after the window. Safe to call
    every step forever — it is a no-op once the window closed or when
    AYOLO_TRACE_DIR is unset.
    """

    START_STEP = 2

    def __init__(self, sub: str = "train") -> None:
        self._target = trace_dir(sub)
        self._steps = int(os.environ.get("AYOLO_TRACE_STEPS", 4))
        self._active = False
        self._done = self._target is None or self._steps <= 0

    def step(self, step_idx: int) -> None:
        if self._done:
            return
        import jax

        if not self._active and step_idx >= self.START_STEP:
            try:
                jax.profiler.start_trace(self._target)
            except Exception as e:  # fail-soft: diagnostics never kill a run
                _warn_once(f"jax.profiler unavailable on this backend ({e!r}); tracing skipped")
                self._done = True
                return
            self._active = True
            self._stop_at = step_idx + self._steps
        elif self._active and step_idx >= self._stop_at:
            self._stop()
            self._done = True

    def close(self) -> None:
        """Stop an open window (end of training shorter than the window)."""
        if self._active:
            self._stop()
        self._done = True

    def _stop(self) -> None:
        import jax

        try:
            jax.profiler.stop_trace()
        except Exception as e:
            _warn_once(f"stopping jax.profiler trace failed ({e!r})")
        self._active = False

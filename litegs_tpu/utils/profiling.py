"""Profiling / tracing helpers.

TPU replacement for the reference's NVTX ranges (nvtx.range_push in
litegs/render/__init__.py:34,56-63 and wrapper.py:680) and its
synchronize-and-time wall clock (trainer.py:206-208):

* ``annotate(name)`` -- a trace annotation visible in the captured
  profile (jax.profiler.TraceAnnotation); nestable, ~free when no trace
  is active;
* ``trace(dir)`` -- capture a device trace around a code block
  (view with xprof / tensorboard-plugin-profile);
* ``timed(fn)`` -- wall-clock with a real device sync (block_until_ready
  on the outputs, the ``torch.cuda.synchronize`` analogue).
"""
from __future__ import annotations

import contextlib
import time

import jax


def annotate(name: str):
    """Trace annotation context (NVTX range_push/range_pop analogue)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, n: int = 1, **kwargs):
    """(mean_seconds, last_output) with a hard device sync per call."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out

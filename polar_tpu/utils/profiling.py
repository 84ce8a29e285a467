"""Profiling / tracing helpers (SURVEY.md §5 "Tracing / profiling").

The reference's only instrumentation is a wall-clock around the decode
call (``testbench.cc:170-175``). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace of the jitted pipeline;
* :func:`annotate` — named TraceAnnotation for marking campaign phases.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/polar_tpu_trace"):
    """Capture a device+host profiler trace of the enclosed block.

    View with TensorBoard (``tensorboard --logdir <log_dir>``) or load the
    .trace.json.gz into Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)

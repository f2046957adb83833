"""Profiling helpers — jax.profiler wrappers.

The reference has no built-in tracer (SURVEY §5); on TPU the idiomatic tool
is the XLA profiler.  These wrappers standardise trace capture + annotation
for the framework's hot paths.
"""

from __future__ import annotations

import contextlib

import jax


def start_trace(log_dir: str) -> None:
    """Begin a profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: str):
    start_trace(log_dir)
    try:
        yield
    finally:
        stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out

"""Performance measurement utilities.

Analog of the reference's bench machinery (reference:
cpp/bench/common/wholegraph_benchmark.hpp:57-110 PerformanceMeter with
warmup/run-count/max-seconds and per-metric bandwidth reporting, and
MultiProcessMeasurePerformance).  Adds the remote-execution-safe timing
pattern: through PJRT tunnels ``block_until_ready`` can return before device
completion, so :func:`measure_chain` times a dependent on-device loop with a
dynamic trip count between two scalar host fetches.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Metric:
    name: str
    value: float
    unit: str


@dataclasses.dataclass
class PerformanceMeter:
    """Collects wall-time samples and derives throughput metrics."""

    warmup: int = 2
    run_count: int = 5
    max_seconds: Optional[float] = None
    samples: List[float] = dataclasses.field(default_factory=list)

    def run(self, fn: Callable[[], None]) -> "PerformanceMeter":
        for _ in range(self.warmup):
            fn()
        start = time.perf_counter()
        for _ in range(self.run_count):
            t0 = time.perf_counter()
            fn()
            self.samples.append(time.perf_counter() - t0)
            if self.max_seconds and time.perf_counter() - start > self.max_seconds:
                break
        return self

    @property
    def mean_time(self) -> float:
        return sum(self.samples) / max(len(self.samples), 1)

    @property
    def min_time(self) -> float:
        return min(self.samples) if self.samples else 0.0

    def bandwidth(self, bytes_per_iter: int, name: str = "bandwidth") -> Metric:
        return Metric(name, bytes_per_iter / self.mean_time / 1e9, "GB/s")

    def throughput(self, items_per_iter: int, name: str, unit: str) -> Metric:
        return Metric(name, items_per_iter / self.mean_time, unit)


def measure_chain(step_fn: Callable, n_iters: int = 8, *args) -> float:
    """Seconds per iteration of ``step_fn(i, *args) -> scalar contribution``,
    measured as a dependent fori_loop chain with dynamic trip count (tunnel-
    safe; the fixed round trip is differenced out)."""

    @jax.jit
    def chain(n, *a):
        def body(i, acc):
            # thread the carry into i through an optimization barrier so
            # steps keyed on i are provably loop-dependent and cannot be
            # hoisted out of the timing loop; unlike the `(acc*0).astype
            # (int32)` trick this stays well-defined when a step yields
            # NaN/Inf (NaN*0 is NaN and float->int of NaN is unspecified)
            ii, acc = jax.lax.optimization_barrier((i, acc))
            return acc + step_fn(ii, *a)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(chain(1, *args))  # compile + warm
    t0 = time.perf_counter()
    float(chain(1, *args))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(1 + n_iters, *args))
    full = time.perf_counter() - t0
    return max((full - base) / n_iters, 1e-9)


# ---------------------------------------------------------------------------
# Profiling (jax.profiler wrappers; reference has no built-in tracer, SURVEY §5)
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace around a block (TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


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

"""Utility-layer tests: perf meter, logger, errors, dtypes, interop
(reference: the util macros are exercised implicitly; we pin behavior)."""

import numpy as np
import pytest

from wholegraph_tpu.utils import (
    ErrorCode,
    InvalidInput,
    LogicError,
    as_jax_dtype,
    check,
    check_input,
    element_size,
    is_floating,
    set_log_level,
)
from wholegraph_tpu.utils.perf import PerformanceMeter


def test_error_codes():
    with pytest.raises(LogicError):
        check(False, "boom")
    with pytest.raises(InvalidInput):
        check_input(False, "bad")
    assert InvalidInput("x").code == ErrorCode.INVALID_INPUT


def test_dtypes():
    import jax.numpy as jnp

    assert as_jax_dtype("float") == jnp.float32
    assert as_jax_dtype("half") == jnp.float16
    assert as_jax_dtype("bfloat16") == jnp.bfloat16
    assert element_size("int64") == 8
    assert element_size("bfloat16") == 2
    assert is_floating("float") and not is_floating("int32")
    with pytest.raises(ValueError):
        as_jax_dtype("nope")


def test_performance_meter():
    calls = []
    m = PerformanceMeter(warmup=2, run_count=3).run(lambda: calls.append(1))
    assert len(calls) == 5  # warmup + runs
    assert len(m.samples) == 3
    bw = m.bandwidth(1_000_000_000)
    assert bw.unit == "GB/s" and bw.value > 0
    tp = m.throughput(100, "edges", "edges/s")
    assert tp.value > 0


def test_log_level_roundtrip():
    set_log_level("debug")
    set_log_level("info")


def test_interop_numpy_roundtrip():
    import torch

    from wholegraph_tpu.interop import from_torch, jax_dtype_to_torch, to_torch, torch_dtype_to_jax

    t = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    x = from_torch(t)
    np.testing.assert_array_equal(np.asarray(x), t.numpy())
    t2 = to_torch(x)
    np.testing.assert_array_equal(t2.numpy(), t.numpy())
    assert torch_dtype_to_jax(torch.float32) == as_jax_dtype("float32")
    assert jax_dtype_to_torch(np.float32) == torch.float32

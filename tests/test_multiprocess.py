"""Forked jax.distributed harness test (reference: MultiProcessRun,
parallel_utils.cpp:46-90 — fork N children, aggregate exit codes)."""

import numpy as np
import pytest

from wholegraph_tpu.parallel.multiprocess import multiprocess_run
from wholegraph_tpu.utils.error import WholeGraphError


def _worker_ok(rank, world):
    import jax
    import jax.numpy as jnp

    assert jax.process_count() == world
    assert jax.process_index() == rank
    # a real cross-process collective
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(jnp.asarray([rank]))
    np.testing.assert_array_equal(np.sort(np.asarray(total).reshape(-1)), np.arange(world))


def _worker_fail(rank, world):
    if rank == 1:
        raise RuntimeError("boom")


@pytest.mark.slow
def test_multiprocess_run_two_procs():
    multiprocess_run(2, _worker_ok, timeout=180)


@pytest.mark.slow
def test_multiprocess_run_propagates_failure():
    with pytest.raises(WholeGraphError):
        multiprocess_run(2, _worker_fail, timeout=180)

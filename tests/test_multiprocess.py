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


def _worker_multicontroller_io(rank, world, tmpdir):
    """ROADMAP 9: host-materialisation + checkpointing under true
    jax.distributed — each process snapshots only ITS shards; process 0
    writes the commit marker after a barrier; to_array assembles the
    global value on every host."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import wholegraph_tpu as wg
    from wholegraph_tpu.embedding import Embedding, LazyAdam
    from wholegraph_tpu.io.checkpoint import load_embedding, save_embedding
    from wholegraph_tpu.memory.sharded_table import ShardedTable

    mesh = wg.parallel.create_global_mesh()
    world_dev = jax.device_count()
    rs = np.random.RandomState(5)
    n, dim = 96, 8
    x = rs.randn(n, dim).astype(np.float32)

    tab = ShardedTable.from_array(mesh, x)
    # each process addresses exactly its own device shards
    mine = tab.addressable_shard_ids()
    assert len(mine) == world_dev // world, (mine, world_dev, world)
    for s in mine:
        start = sum(tab.plan.shard_rows[:s])
        np.testing.assert_array_equal(
            tab.local_shard(s), x[start : start + tab.plan.shard_rows[s]]
        )
    # global materialisation via allgather
    np.testing.assert_array_equal(tab.to_array(), x)

    # checkpoint round-trip across process boundaries
    emb = Embedding.create(mesh, n, dim, optimizer=LazyAdam())
    state = emb.from_array(x)
    ids = jax.device_put(
        jnp.arange(32, dtype=jnp.int32), NamedSharding(mesh, P("data"))
    )
    grads = jax.device_put(
        jnp.asarray(rs.randn(32, dim).astype(np.float32)),
        NamedSharding(mesh, P("data", None)),
    )
    state = emb.apply_gradients(state, ids, grads, 0.1)
    want = emb.to_array(state)
    save_embedding(emb, state, tmpdir, "mc")
    wg.parallel.collectives.barrier()
    assert os.path.exists(os.path.join(tmpdir, "mc_meta.json"))
    loaded = load_embedding(emb, tmpdir, "mc")
    np.testing.assert_array_equal(emb.to_array(loaded), want)
    np.testing.assert_array_equal(
        emb.slot_to_array(loaded, "m"), emb.slot_to_array(state, "m")
    )


@pytest.mark.slow
def test_multicontroller_io_two_procs(tmp_path):
    multiprocess_run(
        2, _worker_multicontroller_io, args=(str(tmp_path),),
        devices_per_proc=2, timeout=300,
    )

"""Hierarchical (node x device) gather tests (reference:
gather_op_impl_hierarchy.cu two-stage flow; equivalence with flat gather)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wholegraph_tpu.memory import PartitionPlan, ShardedTable
from wholegraph_tpu.ops.gather import gather_hierarchical

from conftest import deterministic_rows


def test_hierarchical_gather_matches_reference(hier_mesh):
    n, dim, B = 800, 16, 128
    plan = PartitionPlan.equal(n, 8)
    ref = deterministic_rows(n, dim)
    data = jax.device_put(
        _phys(ref, plan), NamedSharding(hier_mesh, P(("node", "device"), None))
    )
    ids = np.random.RandomState(0).randint(0, n, B).astype(np.int64)
    ids_dev = jax.device_put(
        jnp.asarray(ids), NamedSharding(hier_mesh, P(("node", "device")))
    )
    out = gather_hierarchical(data, ids_dev, plan=plan, mesh=hier_mesh)
    np.testing.assert_allclose(np.asarray(out), ref[ids])


def test_hierarchical_gather_1d(hier_mesh):
    n, B = 640, 64
    plan = PartitionPlan.equal(n, 8)
    ref = np.arange(n, dtype=np.float32) * 3
    data = jax.device_put(
        _phys(ref, plan), NamedSharding(hier_mesh, P(("node", "device")))
    )
    ids = np.random.RandomState(1).randint(0, n, B).astype(np.int64)
    ids_dev = jax.device_put(
        jnp.asarray(ids), NamedSharding(hier_mesh, P(("node", "device")))
    )
    out = gather_hierarchical(data, ids_dev, plan=plan, mesh=hier_mesh)
    np.testing.assert_allclose(np.asarray(out), ref[ids])


def test_hierarchy_table_and_dispatch(hier_mesh):
    """r1 weak #9: hierarchy is reachable from the table API — a
    ShardedTable sharded over ('node', 'device') dispatches
    method='hierarchy' to the two-stage exchange and the default exact a2a
    over the tuple axis; an Embedding trains on the same mesh."""
    n, dim, B = 800, 16, 128
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(hier_mesh, ref, axis=("node", "device"))
    ids = np.random.RandomState(2).randint(0, n, B).astype(np.int64)
    ids_dev = jax.device_put(
        jnp.asarray(ids), NamedSharding(hier_mesh, P(("node", "device")))
    )
    out_h = tab.gather(ids_dev, method="hierarchy")
    np.testing.assert_allclose(np.asarray(out_h), ref[ids])
    # flat exact a2a over the tuple axis (XLA collectives accept the tuple)
    out_flat = tab.gather(ids_dev)
    np.testing.assert_allclose(np.asarray(out_flat), ref[ids])

    # trainable embedding over the hierarchy mesh (flat tuple-axis exchange)
    from wholegraph_tpu.embedding import Embedding, SGD

    emb = Embedding.create(
        hier_mesh, n, dim, optimizer=SGD(), axis=("node", "device")
    )
    state = emb.from_array(ref)
    grads = jax.device_put(
        jnp.ones((B, dim), jnp.float32),
        NamedSharding(hier_mesh, P(("node", "device"), None)),
    )
    state = emb.apply_gradients(state, ids_dev, grads, 0.5)
    got = emb.to_array(state)
    expect = ref.copy()
    uniq, counts = np.unique(ids, return_counts=True)
    expect[uniq] -= 0.5 * counts[:, None]  # SGD, duplicate grads summed
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def _phys(ref, plan):
    shape = (plan.total_physical_rows,) + ref.shape[1:]
    phys = np.zeros(shape, ref.dtype)
    phys[plan.physical_index_np(np.arange(plan.n, dtype=np.int64))] = ref
    return phys


def test_all_same_check(mesh8):
    from wholegraph_tpu.parallel.collectives import all_same_check
    from functools import partial

    @partial(jax.shard_map, mesh=mesh8, in_specs=P("data"), out_specs=P())
    def f(x):
        return all_same_check(x.shape[0], "data").reshape(1)

    assert bool(f(jnp.zeros(16))[0])

    @partial(jax.shard_map, mesh=mesh8, in_specs=P("data"), out_specs=P())
    def g(x):
        return all_same_check(jax.lax.axis_index("data"), "data").reshape(1)

    assert not bool(g(jnp.zeros(16))[0])

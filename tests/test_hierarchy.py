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

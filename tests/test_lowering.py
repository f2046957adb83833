"""Abstract-mesh lowering tests: prove the multi-chip paths (incl. the
ragged alltoallv, which no backend in CI can execute) lower to StableHLO
for an 8-device mesh without hardware."""

import functools

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import AbstractMesh, PartitionSpec as P

from wholegraph_tpu.memory import PartitionPlan
from wholegraph_tpu.ops.gather import (
    _gather_shard_a2a,
    _gather_shard_hierarchy,
    _gather_shard_ragged,
    _scatter_shard_a2a,
)


def _lower(fn, mesh, in_specs, out_specs, *avals):
    jitted = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)
    )
    txt = jitted.lower(*avals).as_text()
    assert len(txt) > 100
    return txt


@pytest.mark.parametrize("method", ["a2a", "ragged"])
def test_gather_lowers_for_8dev_mesh(method):
    mesh = AbstractMesh((8,), ("data",))
    plan = PartitionPlan.equal(8192, 8)
    if method == "a2a":
        body = functools.partial(_gather_shard_a2a, plan=plan, axis="data", cap=48)
    else:
        body = functools.partial(
            _gather_shard_ragged, plan=plan, axis="data", recv_capacity=512
        )
    txt = _lower(
        body, mesh, (P("data", None), P("data")), P("data", None),
        jax.ShapeDtypeStruct((8192, 128), jnp.float32),
        jax.ShapeDtypeStruct((2048,), jnp.int32),
    )
    if method == "ragged":
        assert "ragged_all_to_all" in txt or "ragged-all-to-all" in txt


def test_scatter_lowers_for_8dev_mesh():
    mesh = AbstractMesh((8,), ("data",))
    plan = PartitionPlan.equal(8192, 8)
    body = functools.partial(
        _scatter_shard_a2a, plan=plan, axis="data", cap=48, accumulate=True
    )
    _lower(
        body, mesh, (P("data", None), P("data"), P("data", None)), P("data", None),
        jax.ShapeDtypeStruct((8192, 128), jnp.float32),
        jax.ShapeDtypeStruct((2048,), jnp.int32),
        jax.ShapeDtypeStruct((2048, 128), jnp.float32),
    )


def test_hierarchical_lowers_for_4x8_mesh():
    """32-device (4 hosts x 8 chips) hierarchy — beyond any CI hardware."""
    mesh = AbstractMesh((4, 8), ("node", "device"))
    plan = PartitionPlan.equal(32 * 1024, 32)
    body = functools.partial(
        _gather_shard_hierarchy, plan=plan, node_axis="node", device_axis="device",
        n_nodes=4, per_node=8, cap1=128, cap2=128,
    )
    _lower(
        body, mesh,
        (P(("node", "device"), None), P(("node", "device"))),
        P(("node", "device"), None),
        jax.ShapeDtypeStruct((32 * 1024, 128), jnp.float32),
        jax.ShapeDtypeStruct((4096,), jnp.int32),
    )


def test_native3_gather_scatter_lower_for_8dev_mesh():
    """Native-tile-layout [cap, D//128, 128] shards through the exact a2a
    gather and scatter bodies: the exchange keeps batch rows flat [B, D]
    while the shard stays 3-D (embedding-state layout)."""
    mesh = AbstractMesh((8,), ("data",))
    plan = PartitionPlan.equal(8192, 8)
    body = functools.partial(_gather_shard_a2a, plan=plan, axis="data", cap=48)
    _lower(
        body, mesh, (P("data", None, None), P("data")), P("data", None),
        jax.ShapeDtypeStruct((8192, 1, 128), jnp.float32),
        jax.ShapeDtypeStruct((2048,), jnp.int32),
    )
    sbody = functools.partial(
        _scatter_shard_a2a, plan=plan, axis="data", cap=48, accumulate=False
    )
    _lower(
        sbody, mesh,
        (P("data", None, None), P("data"), P("data", None)),
        P("data", None, None),
        jax.ShapeDtypeStruct((8192, 1, 128), jnp.float32),
        jax.ShapeDtypeStruct((2048,), jnp.int32),
        jax.ShapeDtypeStruct((2048, 128), jnp.float32),
    )


def test_native3_hierarchy_lowers_for_32dev_mesh():
    mesh = AbstractMesh((4, 8), ("node", "device"))
    plan = PartitionPlan.equal(65536, 32)
    body = functools.partial(
        _gather_shard_hierarchy, plan=plan, node_axis="node",
        device_axis="device", n_nodes=4, per_node=8, cap1=1024, cap2=512,
    )
    _lower(
        body, mesh,
        (P(("node", "device"), None, None), P(("node", "device"))),
        P(("node", "device"), None),
        jax.ShapeDtypeStruct((65536, 2, 128), jnp.float32),
        jax.ShapeDtypeStruct((2048,), jnp.int32),
    )

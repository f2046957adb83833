"""PartitionPlan unit tests (reference: wholememory_handle_tests.cpp partition
plan coverage, map_indices round-robin tests)."""

import numpy as np
import pytest

from wholegraph_tpu.memory.partition import PartitionPlan


def check_roundtrip(plan):
    ids = np.arange(plan.n, dtype=np.int64)
    phys = plan.physical_index_np(ids)
    # physical indices unique and within range
    assert len(np.unique(phys)) == plan.n
    assert phys.min() >= 0 and phys.max() < plan.total_physical_rows
    # shard_logical_ids covers all rows exactly once, consistent with owner()
    seen = []
    for s in range(plan.world):
        lids = plan.shard_logical_ids(s)
        assert len(lids) == plan.shard_rows[s]
        own = np.asarray(plan.owner(lids)) if len(lids) else np.zeros(0)
        assert (own == s).all()
        # slot order: physical index of lids must be s*capacity + arange
        p = plan.physical_index_np(lids)
        np.testing.assert_array_equal(
            p, s * plan.capacity + np.arange(len(lids))
        )
        seen.append(lids)
    allseen = np.sort(np.concatenate(seen)) if seen else np.zeros(0)
    np.testing.assert_array_equal(allseen, ids)


@pytest.mark.parametrize("n,world", [(100, 8), (97, 8), (8, 8), (5, 8), (1000, 3)])
def test_equal_block(n, world):
    plan = PartitionPlan.equal(n, world)
    assert sum(plan.shard_rows) == n
    assert plan.is_equal_block
    check_roundtrip(plan)


@pytest.mark.parametrize(
    "sizes", [(10, 20, 5, 65), (0, 50, 0, 50), (1, 1, 1, 1), (100,)]
)
def test_custom_block(sizes):
    plan = PartitionPlan.custom(sizes)
    assert sum(plan.shard_rows) == sum(sizes)
    check_roundtrip(plan)


@pytest.mark.parametrize("n,world,block", [(100, 4, 8), (97, 8, 5), (64, 8, 8), (10, 4, 32)])
def test_round_robin(n, world, block):
    plan = PartitionPlan.round_robin(n, world, block)
    assert sum(plan.shard_rows) == n
    check_roundtrip(plan)
    # round-robin semantics: row i's owner is (i // block) % world
    ids = np.arange(n)
    np.testing.assert_array_equal(
        np.asarray(plan.owner(ids)), (ids // block) % world
    )


def test_jnp_matches_np():
    import jax.numpy as jnp

    for plan in [
        PartitionPlan.equal(1000, 8),
        PartitionPlan.custom((100, 0, 400, 500)),
        PartitionPlan.round_robin(1000, 8, 32),
    ]:
        ids = np.random.RandomState(0).randint(0, plan.n, 256)
        np.testing.assert_array_equal(
            np.asarray(plan.physical_index(jnp.asarray(ids))),
            plan.physical_index_np(ids),
        )

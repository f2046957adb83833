"""Distributed gather/scatter tests vs host reference (reference:
test_wholegraph_gather_scatter.py:130-165 — allclose vs deterministic
value-from-index features, over memory-type/partition combos)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wholegraph_tpu.memory import PartitionPlan, ShardedTable

from conftest import deterministic_rows


def make_table(mesh, n, dim, plan=None, dtype=np.float32):
    ref = deterministic_rows(n, dim, dtype)
    tab = ShardedTable.from_array(mesh, ref, plan=plan)
    return tab, ref


def put_ids(mesh, ids):
    return jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("data")))


PLANS = ["equal", "custom", "round_robin"]


def plan_for(kind, n, world):
    if kind == "equal":
        return PartitionPlan.equal(n, world)
    if kind == "custom":
        rng = np.random.RandomState(42)
        cuts = np.sort(rng.choice(n, world - 1, replace=False))
        sizes = np.diff(np.concatenate([[0], cuts, [n]]))
        return PartitionPlan.custom(tuple(int(x) for x in sizes))
    return PartitionPlan.round_robin(n, world, 16)


@pytest.mark.parametrize("plan_kind", PLANS)
@pytest.mark.parametrize("method", ["a2a", "allgather"])
def test_gather_matches_reference(mesh8, plan_kind, method):
    n, dim, B = 1000, 32, 256
    plan = plan_for(plan_kind, n, 8)
    tab, ref = make_table(mesh8, n, dim, plan)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, n, B).astype(np.int64)
    out = tab.gather(put_ids(mesh8, ids), method=method)
    np.testing.assert_allclose(np.asarray(out), ref[ids], rtol=0, atol=0)


@pytest.mark.parametrize("plan_kind", PLANS)
def test_gather_skewed_ids(mesh8, plan_kind):
    """All ids hit one shard — exercises ragged capacity; factor high enough."""
    n, dim, B = 512, 16, 64
    plan = plan_for(plan_kind, n, 8)
    tab, ref = make_table(mesh8, n, dim, plan)
    ids = np.full(B, 3, dtype=np.int64)  # all the same row
    out = tab.gather(put_ids(mesh8, ids), method="a2a", capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(out), ref[ids])


def test_gather_dedup_heuristic(mesh8):
    """dedup=True (reference sorted-unique-ids heuristic,
    gather_op.cpp:118-120) must be value-identical to the plain path on a
    duplicate-heavy batch."""
    n, dim, B = 500, 16, 256
    tab, ref = make_table(mesh8, n, dim)
    rng = np.random.RandomState(4)
    ids = rng.randint(0, 40, B).astype(np.int64)  # heavy duplication
    out = tab.gather(put_ids(mesh8, ids), dedup=True)
    np.testing.assert_allclose(np.asarray(out), ref[ids], rtol=0, atol=0)
    # and under skew (all duplicates of one shard's rows)
    ids2 = np.full(B, 7, np.int64)
    out2 = tab.gather(put_ids(mesh8, ids2), dedup=True, capacity_factor=1.0)
    np.testing.assert_allclose(np.asarray(out2), ref[ids2])


def test_gather_local_kernel_sorted(mesh8):
    """local_kernel='sorted' (windowed-DMA local take on TPU; plain take
    elsewhere) is value-identical to the default on both sorted-dense and
    duplicate-heavy batches."""
    n, dim, B = 512, 16, 256
    tab, ref = make_table(mesh8, n, dim)
    rng = np.random.RandomState(11)
    ids = np.sort(rng.randint(0, n, B)).astype(np.int64)
    out = tab.gather(put_ids(mesh8, ids), local_kernel="sorted", dedup=True)
    np.testing.assert_allclose(np.asarray(out), ref[ids], rtol=0, atol=0)
    ids2 = rng.randint(0, 30, B).astype(np.int64)
    out2 = tab.gather(put_ids(mesh8, ids2), local_kernel="sorted")
    np.testing.assert_allclose(np.asarray(out2), ref[ids2], rtol=0, atol=0)


def test_gather_int32_ids(mesh8):
    n, dim, B = 300, 8, 64
    tab, ref = make_table(mesh8, n, dim)
    ids = np.random.RandomState(1).randint(0, n, B).astype(np.int32)
    out = tab.gather(put_ids(mesh8, ids))
    np.testing.assert_allclose(np.asarray(out), ref[ids])


def test_gather_under_jit(mesh8):
    n, dim, B = 1000, 32, 256
    tab, ref = make_table(mesh8, n, dim)
    ids = np.random.RandomState(2).randint(0, n, B).astype(np.int64)

    @jax.jit
    def f(tab, ids):
        return tab.gather(ids)

    out = f(tab, put_ids(mesh8, ids))
    np.testing.assert_allclose(np.asarray(out), ref[ids])


@pytest.mark.parametrize("plan_kind", PLANS)
def test_scatter_matches_reference(mesh8, plan_kind):
    n, dim, B = 600, 16, 128
    plan = plan_for(plan_kind, n, 8)
    tab, ref = make_table(mesh8, n, dim, plan)
    rng = np.random.RandomState(3)
    ids = rng.choice(n, B, replace=False).astype(np.int64)  # unique ids
    rows = rng.randn(B, dim).astype(np.float32)
    tab2 = tab.scatter(put_ids(mesh8, ids), jax.device_put(
        jnp.asarray(rows), NamedSharding(mesh8, P("data", None))))
    expect = ref.copy()
    expect[ids] = rows
    np.testing.assert_allclose(tab2.to_array(), expect)


def test_scatter_accumulate(mesh8):
    n, dim, B = 64, 8, 64
    tab, ref = make_table(mesh8, n, dim)
    # duplicate ids: all devices write to the same few rows, accumulate
    ids = (np.arange(B) % 4).astype(np.int64)
    rows = np.ones((B, dim), dtype=np.float32)
    tab2 = tab.scatter(
        put_ids(mesh8, ids),
        jax.device_put(jnp.asarray(rows), NamedSharding(mesh8, P("data", None))),
        accumulate=True,
    )
    expect = ref.copy()
    for i, r in zip(ids, rows):
        expect[i] += r
    np.testing.assert_allclose(tab2.to_array(), expect, rtol=1e-6)


def test_world1_paths():
    mesh1 = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("data",))
    n, dim = 100, 8
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh1, ref)
    ids = np.array([0, 5, 99, 5], dtype=np.int64)
    out = tab.gather(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref[ids])
    tab2 = tab.scatter(jnp.asarray(ids[:2]), jnp.zeros((2, dim), jnp.float32))
    expect = ref.copy()
    expect[ids[:2]] = 0
    np.testing.assert_allclose(tab2.to_array(), expect)


def test_create_and_roundtrip(mesh8):
    tab = ShardedTable.create(mesh8, 100, 16)
    assert tab.shape == (100, 16)
    assert np.asarray(tab.to_array()).sum() == 0
    arr = deterministic_rows(100, 16)
    tab = ShardedTable.from_array(mesh8, arr)
    np.testing.assert_allclose(tab.to_array(), arr)
    # local_shard covers each shard's rows
    got = np.concatenate([tab.local_shard(s) for s in range(8)])
    assert got.shape == arr.shape


def test_host_location_staging(mesh8):
    """Host (pinned) location = staging tier (wholememory_location_t analog):
    allocate/fill on host, migrate to device, gather."""
    n, dim = 200, 16
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, ref, location="host")
    assert tab.location == "host"
    dev = tab.to_location("device")
    assert dev.location == "device"
    ids = np.random.RandomState(0).randint(0, n, 64)
    out = dev.gather(put_ids(mesh8, ids.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(out), ref[ids])
    back = dev.to_location("host")
    assert back.location == "host"
    np.testing.assert_allclose(back.to_array(), ref)


@pytest.mark.parametrize("dtype", [np.float32, np.float16, np.int32, np.int64])
def test_gather_dtypes(mesh8, dtype):
    """Dtype sweep (reference TEST_P matrix: memory type x dtype,
    wholememory_embedding_tests.cu:171-212)."""
    n, dim, B = 300, 16, 64
    if np.issubdtype(dtype, np.floating):
        ref = deterministic_rows(n, dim).astype(dtype)
    else:
        ref = (deterministic_rows(n, dim) * 1000).astype(dtype)
    tab = ShardedTable.from_array(mesh8, ref)
    ids = np.random.RandomState(0).randint(0, n, B).astype(np.int64)
    out = tab.gather(put_ids(mesh8, ids))
    np.testing.assert_array_equal(np.asarray(out), ref[ids])


def test_gather_bfloat16(mesh8):
    import jax.numpy as jnp2

    n, dim, B = 200, 16, 64
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(
        mesh8, np.asarray(jnp.asarray(ref, jnp2.bfloat16))
    )
    assert tab.dtype == jnp2.bfloat16
    ids = np.random.RandomState(1).randint(0, n, B).astype(np.int64)
    out = tab.gather(put_ids(mesh8, ids))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref[ids], rtol=1e-2, atol=1e-2
    )


def test_gather_overflow_counter(mesh8):
    from wholegraph_tpu.ops.gather import gather_overflow

    n = 512
    plan = PartitionPlan.equal(n, 8)
    # uniform ids: no overflow expected at factor 2
    ids = put_ids(mesh8, np.random.RandomState(0).randint(0, n, 256).astype(np.int64))
    assert int(gather_overflow(ids, plan=plan, mesh=mesh8)[0]) == 0
    # all ids to one shard: B_local=32 per device to owner 0, cap(32,8,2.0)=24
    skew = put_ids(mesh8, np.zeros(256, np.int64))
    dropped = int(gather_overflow(skew, plan=plan, mesh=mesh8)[0])
    assert dropped == 8 * (32 - 24), dropped
    # sampler padding (ids >= n) never enters a bucket -> no phantom overflow
    padded = np.random.RandomState(1).randint(0, n, 256).astype(np.int64)
    padded[128:] = n + np.arange(128)  # multilayer padding convention
    assert int(gather_overflow(put_ids(mesh8, padded), plan=plan, mesh=mesh8)[0]) == 0


@pytest.mark.parametrize("plan_kind", PLANS)
@pytest.mark.parametrize("location", ["device", "host"])
def test_create_matrix(mesh8, plan_kind, location):
    """Creation matrix: plan type x location (reference
    wholememory_handle_tests.cpp:29-116 parameter sweep)."""
    n, dim = 120, 8
    plan = plan_for(plan_kind, n, 8)
    tab = ShardedTable.create(mesh8, n, dim, plan=plan, location=location)
    assert tab.location == location
    assert tab.shape == (n, dim)
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, ref, plan=plan, location=location)
    np.testing.assert_allclose(tab.to_array(), ref)


def test_gather_exact_under_full_skew(mesh8):
    """The default method is EXACT: a batch whose ids ALL live on one shard
    (maximal bucket overflow) returns every row correctly, zero drops — the
    reference alltoallv semantics (gather_op_impl_nccl.cu:101-170 never
    drops), here via extra exchange rounds."""
    n, dim, B = 512, 8, 256
    plan = PartitionPlan.equal(n, 8)
    ref = deterministic_rows(n, dim) + 1.0  # strictly positive rows
    tab = ShardedTable.from_array(mesh8, ref, plan=plan)
    ids = np.zeros(B, np.int64)  # every id -> shard 0
    out = np.asarray(tab.gather(put_ids(mesh8, ids), capacity_factor=1.0))
    np.testing.assert_allclose(out, np.broadcast_to(ref[0], (B, dim)), rtol=1e-6)
    # mixed skew: ids concentrated on two shards plus a uniform tail
    rs = np.random.RandomState(3)
    ids2 = np.where(rs.rand(B) < 0.8, rs.randint(0, 128, B), rs.randint(0, n, B))
    out2 = np.asarray(tab.gather(put_ids(mesh8, ids2), capacity_factor=1.0))
    np.testing.assert_allclose(out2, ref[ids2], rtol=1e-6)


def test_gather_capped_drop_semantics(mesh8):
    """Opt-in capped fast path: bucket-overflow ids yield ZERO rows (not
    garbage), everything within capacity is exact, and gather_overflow
    predicts the drop count."""
    n, dim, B = 512, 8, 256
    plan = PartitionPlan.equal(n, 8)
    ref = deterministic_rows(n, dim) + 1.0  # strictly positive rows
    tab = ShardedTable.from_array(mesh8, ref, plan=plan)
    ids = np.zeros(B, np.int64)  # every id -> shard 0
    out = np.asarray(
        tab.gather(put_ids(mesh8, ids), method="a2a_capped", capacity_factor=1.0)
    )
    zero_rows = (out == 0).all(axis=1)
    exact_rows = np.isclose(out, ref[0]).all(axis=1)
    assert (zero_rows | exact_rows).all()
    assert zero_rows.any() and exact_rows.any()
    from wholegraph_tpu.ops.gather import gather_overflow
    dropped = int(gather_overflow(put_ids(mesh8, ids), plan=plan, mesh=mesh8,
                                  capacity_factor=1.0)[0])
    assert dropped == int(zero_rows.sum())


def test_scatter_exact_under_full_skew(mesh8):
    """Exact scatter: accumulate=True sums every contribution exactly once
    even when all ids target one shard (multi-round delivery)."""
    n, dim, B = 512, 8, 256
    plan = PartitionPlan.equal(n, 8)
    tab = ShardedTable.create(mesh8, n, dim, plan=plan)
    ids = np.zeros(B, np.int64)
    rows = np.ones((B, dim), np.float32)
    out = tab.scatter(
        put_ids(mesh8, ids),
        jax.device_put(
            jnp.asarray(rows),
            NamedSharding(mesh8, P("data", None)),
        ),
        accumulate=True,
        capacity_factor=1.0,
    )
    got = out.to_array()
    assert got[0, 0] == B  # all B contributions landed
    assert (got[1:] == 0).all()

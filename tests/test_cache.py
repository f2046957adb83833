"""Hot-cache tests (reference: gather_cached_func + cacheset tests —
here: cached gather equals plain gather when capacities suffice)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wholegraph_tpu.embedding.cache import (
    build_hot_cache,
    gather_with_cache,
    hot_ids_by_degree,
)
from wholegraph_tpu.memory import ShardedTable

from conftest import deterministic_rows


def test_cached_gather_matches_plain(mesh8):
    n, dim, B = 600, 16, 256
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, ref)
    hot = np.arange(0, n, 2)  # half the table is hot
    cache = build_hot_cache(tab, hot)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, n, B)
    ids_dev = jax.device_put(jnp.asarray(ids), NamedSharding(mesh8, P("data")))
    # ~50% miss rate; cold capacity 1.0 of batch -> no drops
    out = gather_with_cache(tab, cache, ids_dev, cold_capacity_factor=1.0)
    np.testing.assert_allclose(np.asarray(out), ref[ids], rtol=1e-6)


def test_cached_gather_all_hot(mesh8):
    n, dim, B = 200, 8, 64
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, ref)
    cache = build_hot_cache(tab, np.arange(n))
    ids = np.random.RandomState(1).randint(0, n, B)
    ids_dev = jax.device_put(jnp.asarray(ids), NamedSharding(mesh8, P("data")))
    out = gather_with_cache(tab, cache, ids_dev, cold_capacity_factor=0.25)
    np.testing.assert_allclose(np.asarray(out), ref[ids], rtol=1e-6)


def test_cached_gather_world1():
    mesh1 = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("data",))
    n, dim = 100, 8
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh1, ref)
    cache = build_hot_cache(tab, np.arange(0, n, 3))
    ids = np.random.RandomState(2).randint(0, n, 32)
    out = gather_with_cache(tab, cache, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref[ids], rtol=1e-6)


def test_hot_ids_by_degree():
    row_ptr = np.array([0, 10, 11, 30, 31, 33])
    hot = hot_ids_by_degree(row_ptr, 0.4)
    assert set(hot) == {0, 2}


def test_refresh_hot_cache(mesh8):
    from wholegraph_tpu.embedding.cache import refresh_hot_cache

    n, dim = 100, 8
    ref = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, ref)
    cache = build_hot_cache(tab, np.arange(0, n, 2))
    # mutate the table, then refresh
    tab2 = ShardedTable.from_array(mesh8, ref * 2)
    cache2 = refresh_hot_cache(tab2, cache)
    np.testing.assert_allclose(np.asarray(cache2.values), ref[::2] * 2)

"""Hot-row replication cache for read-only feature tables.

TPU-native rethink of the reference's embedding cache (reference:
cpp/src/wholememory/embedding_cache.{hpp,cpp} — 32-way set-associative LFU
with 14-bit counters, and the ``local_cached_global_readonly_embedding``
gather path, embedding.cpp:769).

Why not a direct LFU port: under XLA's static shapes every gather issues
fixed-size collective buffers regardless of hit count, so a *dynamic*
per-batch cache cannot reduce wire traffic (docs/DESIGN.md).  What does
reduce traffic is shrinking the buffers themselves: replicate a static set of
hot rows on every device (chosen once, e.g. by degree or access frequency —
the steady state an LFU cache converges to for power-law graph access), and
size the collective exchange for only the expected cold fraction.

Semantics match the reference's READONLY cache mode: the cached table must
not be written through the cache (writeback/drop_all are trivial here —
rebuild).  Cold ids beyond ``cold_capacity`` are dropped (zero rows), the
same capacity trade as the a2a bucketing; size ``cold_capacity_factor`` for
your miss rate.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..memory.sharded_table import ShardedTable
from ..ops.gather import _bucket_cap, _gather_shard_a2a, index_dtype as _index_dtype
from ..utils.error import check_input

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HotCache:
    """Replicated hot rows: sorted ids + values (replicated on every device)."""

    hot_ids: Array  # [H] sorted int32
    values: Array  # [H, D]

    def tree_flatten(self):
        return (self.hot_ids, self.values), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @property
    def size(self) -> int:
        return self.hot_ids.shape[0]


def build_hot_cache(table: ShardedTable, hot_ids: np.ndarray) -> HotCache:
    """Replicate the given rows on all devices (cache fill; the analog of the
    reference's cache warm-up, done once because the hot set is static)."""
    hot_ids = np.unique(np.asarray(hot_ids, np.int64))
    check_input(len(hot_ids) > 0, "empty hot set")
    check_input(hot_ids[0] >= 0 and hot_ids[-1] < table.n, "hot id out of range")
    rows = table.to_array()[hot_ids]
    rep = NamedSharding(table.mesh, P())
    return HotCache(
        hot_ids=jax.device_put(jnp.asarray(hot_ids, jnp.int32), rep),
        values=jax.device_put(jnp.asarray(rows), rep),
    )


def refresh_hot_cache(table: ShardedTable, cache: HotCache) -> HotCache:
    """Re-fill the replica from the current table — the analog of the
    reference's cache writeback/drop_all maintenance
    (wholememory_embedding_writeback_cache / drop_all_cache,
    embedding.h:220-244).  Our cache is read-only so "writeback" is a no-op;
    refreshing re-captures rows after out-of-band table updates."""
    import jax as _jax

    return build_hot_cache(table, np.asarray(_jax.device_get(cache.hot_ids)))


def hot_ids_by_degree(row_ptr: np.ndarray, ratio: float) -> np.ndarray:
    """Pick the top-ratio highest-degree nodes (the cache_ratio analog,
    embedding.h cache policy)."""
    n = len(row_ptr) - 1
    h = max(int(n * ratio), 1)
    deg = np.diff(row_ptr)
    return np.sort(np.argpartition(deg, -h)[-h:])


def _gather_cached_shard(
    shard: Array,
    hot_ids: Array,
    hot_vals: Array,
    ids: Array,
    *,
    plan,
    axis: str,
    cap: int,
    cold_cap: int,
):
    """Per-device cached gather: serve hits from the replica, pack misses
    into a cold buffer, exchange only the cold buffer."""
    B = ids.shape[0]
    idt = _index_dtype(plan)
    ids = ids.astype(idt)
    pos = jnp.searchsorted(hot_ids.astype(idt), ids)
    posc = jnp.minimum(pos, hot_ids.shape[0] - 1)
    hit = hot_ids.astype(idt)[posc] == ids
    hot_rows = jnp.take(hot_vals, posc, axis=0)

    order = jnp.argsort(hit, stable=True)  # misses (False) first
    cold_valid = ~hit[order][:cold_cap]
    cold_ids = jnp.where(cold_valid, ids[order][:cold_cap], 0)
    cold_rows = _gather_shard_a2a(shard, cold_ids, plan=plan, axis=axis, cap=cap)

    out = jnp.where(hit[:, None], hot_rows.astype(cold_rows.dtype), 0)
    scatter_pos = jnp.where(cold_valid, order[:cold_cap], B)
    return out.at[scatter_pos].set(cold_rows, mode="drop")


def gather_with_cache(
    table: ShardedTable,
    cache: HotCache,
    ids: Array,
    *,
    cold_capacity_factor: float = 0.5,
    capacity_factor: float = 2.0,
) -> Array:
    """Gather with hot-replica short-circuit (gather_cached_func analog,
    gather_cached_func.cu:30).  Wire traffic scales with ``cold_capacity``
    = B_local * cold_capacity_factor instead of the full batch."""
    plan, mesh, axis = table.plan, table.mesh, table.axis
    world = plan.world
    if world == 1:
        # no wire traffic to save; serve hits from replica anyway for parity
        phys = plan.physical_index(ids)
        from ..ops.gather import local_take

        posc = jnp.minimum(jnp.searchsorted(cache.hot_ids, ids.astype(jnp.int32)),
                           cache.size - 1)
        hit = cache.hot_ids[posc] == ids.astype(jnp.int32)
        hot = jnp.take(cache.values, posc, axis=0)
        cold = local_take(table.data, phys)
        return jnp.where(hit[:, None], hot.astype(cold.dtype), cold)

    B_global = ids.shape[0]
    check_input(B_global % world == 0, "global batch must divide mesh axis")
    B_local = B_global // world
    cold_cap = max(int(B_local * cold_capacity_factor), world)
    cold_cap += -cold_cap % world  # divisible for the inner exchange
    cap = _bucket_cap(cold_cap, world, capacity_factor)

    fn = _build_cached_gather_fn(plan, mesh, axis, cap, cold_cap)
    return fn(table.data, cache.hot_ids, cache.values, ids)


@functools.lru_cache(maxsize=None)
def _build_cached_gather_fn(plan, mesh, axis, cap, cold_cap):
    body = functools.partial(
        _gather_cached_shard, plan=plan, axis=axis, cap=cap, cold_cap=cold_cap
    )
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(None, None), P(axis)),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )

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
rebuild).  Cold ids are served EXACTLY: misses beyond ``cold_capacity`` are
fetched in additional multi-round a2a waves under ``lax.while_loop`` (no
silent drops — see ``gather_cached``'s wave loop below); ``cold_capacity``
only sizes the per-wave buffer, so undersizing it costs extra rounds, never
correctness.
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
    """Replicated hot rows: sorted ids + values (replicated on every device).

    ``valid`` supports TRAINABLE tables: a sparse update invalidates the
    touched hot lines (:func:`invalidate_touched` — the static-shape analog
    of the reference's cache drop, embedding.h:220-244 drop_all/writeback);
    invalid lines are served as misses until :func:`refresh_hot_cache`
    re-captures them (e.g. once per epoch)."""

    hot_ids: Array  # [H] sorted int32
    values: Array  # [H, D]
    valid: Array  # [H] bool — False = stale (serve as miss)

    def tree_flatten(self):
        return (self.hot_ids, self.values, self.valid), None

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
        valid=jax.device_put(jnp.ones((len(hot_ids),), bool), rep),
    )


def refresh_hot_cache(table: ShardedTable, cache: HotCache) -> HotCache:
    """Re-fill the replica from the current table and re-validate every line
    — the analog of the reference's cache writeback/drop_all maintenance
    (wholememory_embedding_writeback_cache / drop_all_cache,
    embedding.h:220-244).  With the invalidation protocol this is the
    periodic re-capture after training steps."""
    from ..parallel.collectives import fetch_global

    return build_hot_cache(table, fetch_global(cache.hot_ids))


def invalidate_touched(cache: HotCache, ids: Array) -> HotCache:
    """Mark hot lines whose ids appear in this update batch as stale — call
    (inside the jitted train step) after ``Embedding.apply_gradients`` when
    the cached table is trainable.  The static-shape analog of
    update_cache_direct: instead of pushing new values into a replicated
    cache, drop the lines and let :func:`refresh_hot_cache` re-capture them
    (e.g. once per epoch).  Pure jnp — GSPMD inserts the cross-device union
    when ``ids`` is sharded and ``valid`` replicated."""
    H = cache.size
    ids32 = jnp.asarray(ids).astype(jnp.int32)
    posc = jnp.minimum(jnp.searchsorted(cache.hot_ids, ids32), H - 1)
    hit = cache.hot_ids[posc] == ids32
    touched = (
        jnp.zeros((H,), jnp.int32).at[jnp.where(hit, posc, H)].set(1, mode="drop")
    )
    return dataclasses.replace(cache, valid=cache.valid & (touched == 0))


def hot_ids_by_degree(row_ptr: np.ndarray, ratio: float) -> np.ndarray:
    """Pick the top-ratio highest-degree nodes (the cache_ratio analog,
    embedding.h cache policy)."""
    n = len(row_ptr) - 1
    h = max(int(n * ratio), 1)
    deg = np.diff(row_ptr)
    return np.sort(np.argpartition(deg, -h)[-h:])


# ---------------------------------------------------------------------------
# Frequency-adaptive admission (the reference LFU's steady-state behavior)
# ---------------------------------------------------------------------------
#
# The reference cache LEARNS the hot set online: per-access 14-bit scaled LFU
# counters + per-batch admission (reference: embedding_cache_func.cu:118
# ComputeCacheSetLocalID, :210 UpdateCacheDirectKernel).  Per-batch dynamic
# admission cannot shrink static-shape wire traffic on TPU (docs/DESIGN.md),
# but the LFU's *steady state* — cache the most-frequently-accessed rows —
# is reachable with static shapes: a jit-traced touch counter (one
# scatter-add per gather batch) + periodic counter-driven re-selection of
# the replicated hot set.  On access distributions that degree does not
# predict, the refreshed hot set converges to the true hot rows within one
# refresh period (tests/test_cache.py::test_adaptive_refresh_beats_degree).


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TouchCounter:
    """Per-row access counts (replicated).  4 B/row — the whole-node analog
    of the reference's per-cache-line 14-bit counters; aging happens at
    refresh time via :func:`decay` (the reference scales counters down when
    they saturate, embedding_cache.hpp:52-112)."""

    counts: Array  # [n] int32

    def tree_flatten(self):
        return (self.counts,), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def make_touch_counter(n: int, mesh=None) -> TouchCounter:
    z = jnp.zeros((n,), jnp.int32)
    if mesh is not None:
        z = jax.device_put(z, NamedSharding(mesh, P()))
    return TouchCounter(z)


def touch(counter: TouchCounter, ids: Array, mask: Array | None = None) -> TouchCounter:
    """Record one access per (valid) id — call inside the jitted train step
    right where the gather happens; one scatter-add, no host sync."""
    n = counter.counts.shape[0]
    ids32 = jnp.asarray(ids).astype(jnp.int32).reshape(-1)
    if mask is not None:
        ids32 = jnp.where(mask.reshape(-1), ids32, n)  # park padding off-table
    return TouchCounter(counter.counts.at[ids32].add(1, mode="drop"))


def decay(counter: TouchCounter, factor: int = 2) -> TouchCounter:
    """Age the counters (periodic scale-down, like the reference's scaled
    LFU) so the hot set can track distribution shift."""
    return TouchCounter(counter.counts // factor)


def hot_ids_by_count(counter: TouchCounter, size: int) -> np.ndarray:
    """Top-``size`` most-touched row ids (host-side; refresh-time only)."""
    from ..parallel.collectives import fetch_global

    c = np.asarray(fetch_global(counter.counts))
    size = min(max(int(size), 1), len(c))
    return np.sort(np.argpartition(c, -size)[-size:])


def refresh_hot_cache_adaptive(
    table: ShardedTable, cache: HotCache, counter: TouchCounter,
    *, decay_factor: int = 2,
):
    """Periodic counter-driven re-admission: replace the hot set with the
    currently most-touched rows (same capacity), re-fill from the table,
    and age the counters.  Call between epochs (or every k steps) — the
    static-shape schedule of the reference's per-batch LFU admission.
    Returns ``(new_cache, aged_counter)``."""
    new_cache = build_hot_cache(table, hot_ids_by_count(counter, cache.size))
    return new_cache, decay(counter, decay_factor)


def cache_hit_fraction(cache: HotCache, ids) -> float:
    """Fraction of ``ids`` served by (valid lines of) the hot replica —
    the observability hook the reference exposes via cache statistics."""
    from ..parallel.collectives import fetch_global

    hot = np.asarray(fetch_global(cache.hot_ids))
    valid = np.asarray(fetch_global(cache.valid))
    ids_np = np.asarray(fetch_global(jnp.asarray(ids))).reshape(-1)
    pos = np.minimum(np.searchsorted(hot, ids_np), len(hot) - 1)
    return float(np.mean((hot[pos] == ids_np) & valid[pos]))


def _gather_cached_shard(
    shard: Array,
    hot_ids: Array,
    hot_vals: Array,
    hot_valid: Array,
    ids: Array,
    *,
    plan,
    axis: str,
    cap: int,
    cold_cap: int,
):
    """Per-device cached gather: serve hits from the (valid lines of the)
    replica, pack misses into a cold buffer sized ``cold_cap``, exchange the
    cold buffer — repeating in waves under a while_loop until every miss is
    served (no silent cold-capacity drops; heavy-miss batches pay extra
    waves instead)."""
    B = ids.shape[0]
    idt = _index_dtype(plan)
    ids = ids.astype(idt)
    pos = jnp.searchsorted(hot_ids.astype(idt), ids)
    posc = jnp.minimum(pos, hot_ids.shape[0] - 1)
    hit = (hot_ids.astype(idt)[posc] == ids) & hot_valid[posc]
    hot_rows = jnp.take(hot_vals, posc, axis=0)

    out = jnp.where(hit[:, None], hot_rows.astype(shard.dtype), 0)
    served0 = hit

    def wave(out, served):
        order = jnp.argsort(jnp.where(served, 1, 0), stable=True)  # unserved first
        sel = order[:cold_cap]
        take = ~served[sel]
        cold_ids = jnp.where(take, ids[sel], 0)
        cold_rows = _gather_shard_a2a(shard, cold_ids, plan=plan, axis=axis, cap=cap)
        wpos = jnp.where(take, sel, B)
        out = out.at[wpos].set(cold_rows, mode="drop")
        served = served.at[wpos].set(True, mode="drop")
        return out, served

    def remaining(served):
        return jax.lax.psum(jnp.sum(~served).astype(jnp.int32), axis)

    out, served = wave(out, served0)

    def body(state):
        out, served = wave(state[0], state[1])
        return out, served, remaining(served)

    out, served, _ = jax.lax.while_loop(
        lambda s: s[2] > 0, body, (out, served, remaining(served))
    )
    return out


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
        hit = (cache.hot_ids[posc] == ids.astype(jnp.int32)) & cache.valid[posc]
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
    return fn(table.data, cache.hot_ids, cache.values, cache.valid, ids)


@functools.lru_cache(maxsize=None)
def _build_cached_gather_fn(plan, mesh, axis, cap, cold_cap):
    body = functools.partial(
        _gather_cached_shard, plan=plan, axis=axis, cap=cap, cold_cap=cold_cap
    )
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(None, None), P(), P(axis)),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )

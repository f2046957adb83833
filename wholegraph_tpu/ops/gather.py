"""Distributed gather/scatter over row-sharded tables.

TPU-native replacement for the reference's gather/scatter stack:

* the raw vectorised gather/scatter kernels
  (reference: cpp/src/wholememory_ops/functions/gather_scatter_func.cuh:211-446)
  become a local row ``take`` (XLA gather / Pallas kernel, see
  :mod:`wholegraph_tpu.ops.gather_pallas`);
* the NCCL bucket-exchange path — bucket ids by owner rank → alltoallv ids →
  local gather → alltoallv embeddings → reorder
  (reference: cpp/src/wholememory_ops/functions/gather_op_impl_nccl.cu:34-185,
  exchange_ids_nccl_func.cu, bucket_ids_func.cu:52) — becomes a bucket-by-owner
  + all-to-all exchange inside ``shard_map``, with XLA collectives over the
  ICI mesh instead of NCCL;
* the direct-mapped (NVLink/chunked/continuous) and NVSHMEM one-sided paths
  collapse into the same collective path (no peer-mapped HBM on TPU).

XLA is shape-static, so the alltoallv becomes one of:

* ``'a2a'`` (default): EXACT multi-round dense-bucket exchange.  Each round
  sends up to ``bucket_capacity`` ids per owner in a
  ``[world, bucket_capacity]`` buffer (sentinel-padded), one
  ``lax.all_to_all`` each way; ids that overflow a bucket are carried to the
  next round, and a ``lax.while_loop`` repeats until every id is delivered
  (a ``psum`` of the undelivered count is the uniform exit condition).  With
  uniformly distributed ids one round suffices — the loop exits after a
  scalar check; under skew the loop pays exactly the extra volume the
  overflow needs, matching the reference's dynamic alltoallv semantics
  (gather_op_impl_nccl.cu:101-170 never drops) under static shapes.
* ``'a2a_capped'``: the single-round fast path — ids beyond a bucket's
  capacity are DROPPED (their output rows are 0), the trade MoE routing
  makes.  Opt-in for latency-critical loops; monitor with
  :func:`gather_overflow`.
* ``'ragged'``: exact alltoallv via ``lax.ragged_all_to_all`` with a whole-
  device receive capacity (TPU backends only; XLA:CPU lacks the op).
* ``'allgather'``: exact, no capacity assumption, W× communication volume.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..memory.partition import PartitionPlan
from ..utils.error import check_input

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def axis_size(mesh: Mesh, axis) -> int:
    """Devices along ``axis`` — a mesh axis name or a tuple of names (tables
    sharded over a hierarchy mesh use ``axis=('node', 'device')``; XLA
    collectives accept the tuple directly)."""
    if isinstance(axis, tuple):
        out = 1
        for a in axis:
            out *= mesh.shape[a]
        return out
    return mesh.shape[axis]


def index_dtype(plan: PartitionPlan):
    """int32 index dtype with an explicit guard: with jax x64 disabled an
    int64 fallback would silently truncate, so tables past 2^31 physical
    rows must be partitioned further (each shard indexes locally)."""
    if plan.total_physical_rows >= 2**31:
        raise NotImplementedError(
            f"table has {plan.total_physical_rows} physical rows >= 2^31; "
            "x64 is disabled — use more shards or a hierarchy mesh"
        )
    return jnp.int32


# ---------------------------------------------------------------------------
# Local take / write (single-shard hot loop)
# ---------------------------------------------------------------------------


_PALLAS_MIN_ROWS = 4096  # below this, jnp.take's lower fixed overhead wins


def _local_take_impl(shard: Array, slots: Array) -> Array:
    """Rows of a 2-D [N, D] shard or a NATIVE-layout 3-D [N, D//128, 128]
    shard (the loop-carry form — the 2-D<->3-D reshape is a real relayout,
    so mutable tables store 3-D and only per-batch outputs convert).
    Always returns flat [B, D]."""
    native3 = shard.ndim == 3 and shard.shape[-1] == 128
    if (
        jax.default_backend() == "tpu"
        and (native3 or (shard.ndim == 2 and shard.shape[1] % 128 == 0))
        and slots.ndim == 1
        and slots.shape[0] >= _PALLAS_MIN_ROWS
    ):
        from .gather_pallas import _gather_rows_pallas3_impl, gather_rows_pallas

        B = slots.shape[0]
        slots = jnp.clip(slots.astype(jnp.int32), 0, shard.shape[0] - 1)
        pad = -B % 1024
        if pad:
            slots = jnp.concatenate([slots, jnp.zeros((pad,), slots.dtype)])
        if native3:
            out = _gather_rows_pallas3_impl(shard, slots)[:B]
            return out.reshape(B, -1)
        out = gather_rows_pallas(shard, slots)
        return out[:B] if pad else out
    out = jnp.take(shard, slots, axis=0, mode="clip")
    return out.reshape(slots.shape[0], -1) if native3 else out


@jax.custom_vjp
def local_take(shard: Array, slots: Array) -> Array:
    """Gather rows of a local shard: out[i] = shard[slots[i]] (clip semantics).

    The local analog of gather_func_kernel (gather_scatter_func.cuh:254).
    On TPU, large batches with 128-aligned rows dispatch to the Pallas
    DMA-ring kernel (ops/gather_pallas.py — ~1.4x XLA's serialized gather on
    v5e); everything else uses XLA's take.  Differentiable: the backward is
    the matching scatter-add (pallas kernels have no autodiff rules, so the
    VJP is explicit).
    """
    return _local_take_impl(shard, slots)


def _local_take_fwd(shard, slots):
    return _local_take_impl(shard, slots), (slots, shard)


def _local_take_bwd(res, ct):
    slots, shard = res
    clipped = jnp.clip(slots, 0, shard.shape[0] - 1)
    ct = ct.reshape(ct.shape[0], *shard.shape[1:])  # [B, D] ct onto 3-D shards
    dshard = (
        jnp.zeros(shard.shape, ct.dtype)
        .at[clipped]
        .add(ct, mode="drop")
        .astype(shard.dtype)
    )
    dslots = jnp.zeros(slots.shape, jax.dtypes.float0)
    return dshard, dslots


local_take.defvjp(_local_take_fwd, _local_take_bwd)


def local_write(shard: Array, slots: Array, rows: Array, mask: Optional[Array] = None) -> Array:
    """Scatter rows into a local shard (scatter_func_kernel analog).
    Out-of-bounds slots are dropped; ``mask=False`` rows are dropped too.
    ``rows`` is flat [B, D]; 3-D native-layout shards accepted."""
    if mask is not None:
        slots = jnp.where(mask, slots, shard.shape[0])
    rows = rows.reshape(rows.shape[0], *shard.shape[1:])
    return shard.at[slots].set(rows, mode="drop")


def local_add(shard: Array, slots: Array, rows: Array, mask: Optional[Array] = None) -> Array:
    if mask is not None:
        slots = jnp.where(mask, slots, shard.shape[0])
    rows = rows.reshape(rows.shape[0], *shard.shape[1:])
    return shard.at[slots].add(rows, mode="drop")


# ---------------------------------------------------------------------------
# Bucketing (bucket_ids_for_ranks_kernel analog, bucket_ids_func.cu:52)
# ---------------------------------------------------------------------------


def bucket_by_owner(ids: Array, owner: Array, world: int, cap: int, fill):
    """Pack ids into per-owner buckets ``[world, cap]``.

    Returns (bucket, src_pos) where ``bucket[w, j]`` is the j-th id owned by
    shard w (or ``fill`` padding) and ``src_pos[w, j]`` is its position in the
    original ids array (or ``-1``).  Ids past ``cap`` per owner are dropped.
    """
    B = ids.shape[0]
    order = jnp.argsort(owner, stable=True)
    sowner = owner[order]
    sids = ids[order]
    counts = jnp.bincount(owner, length=world)
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    rank_in_bucket = jnp.arange(B) - offsets[sowner]
    bucket = jnp.full((world, cap), fill, dtype=ids.dtype)
    bucket = bucket.at[sowner, rank_in_bucket].set(sids, mode="drop")
    src_pos = jnp.full((world, cap), -1, dtype=jnp.int32)
    src_pos = src_pos.at[sowner, rank_in_bucket].set(order.astype(jnp.int32), mode="drop")
    return bucket, src_pos


# ---------------------------------------------------------------------------
# Dense padded all-to-all bodies (run inside shard_map)
# ---------------------------------------------------------------------------


def _serve_requests(
    shard: Array, req: Array, *, plan: PartitionPlan, oob, local_kernel: str = "ring"
):
    """Local-take rows for a flat id-request buffer (sentinel → zero row).
    Returns (rows, served_mask) — the plain device path serves everything.

    ``local_kernel='sorted'`` serves through the windowed multi-row-DMA
    kernel (ops/gather_pallas.py local_take_sorted): exact for any request
    pattern, fastest when requests arrive segment-sorted and dense — the
    dedup path's buckets are sorted by construction."""
    valid = req < oob
    slots = jnp.where(valid, plan.local_slot(jnp.where(valid, req, 0)), 0)
    if local_kernel == "sorted":
        from .gather_pallas import local_take_sorted

        rows = local_take_sorted(shard, slots)
    else:
        rows = local_take(shard, slots)
    return jnp.where(valid[:, None], rows, jnp.zeros_like(rows)), valid


def _gather_round(serve_fn, ids, owner_eff, out, delivered, *, world, axis, cap, oob):
    """One bucket → a2a ids → serve → a2a rows → un-permute round.

    ``serve_fn(req_flat) -> (rows, served_mask)`` answers the id requests
    landing on this device; requests it could NOT serve this round
    (``served_mask`` False, e.g. a capped host-memory fetch) stay
    undelivered and repeat next round.  Entries with ``owner_eff == world``
    are excluded (already delivered).  Returns updated (out, delivered)."""
    bucket, src_pos = bucket_by_owner(ids, owner_eff, world, cap, oob)
    pos = src_pos.reshape(world * cap)
    safe_pos = jnp.where(pos >= 0, pos, ids.shape[0])  # padding → dropped

    # requests: row w of my bucket goes to device w
    req = lax.all_to_all(bucket, axis, split_axis=0, concat_axis=0, tiled=True)
    rows, served = serve_fn(req.reshape(world * cap))

    # replies: chunk v of rows goes back to device v (+ its served bits)
    back = lax.all_to_all(
        rows.reshape(world, cap, -1), axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(world * cap, -1)
    served_back = lax.all_to_all(
        served.reshape(world, cap), axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(world * cap)

    write_pos = jnp.where(served_back, safe_pos, ids.shape[0])
    out = out.at[write_pos].set(back, mode="drop")
    delivered = delivered.at[write_pos].set(True, mode="drop")
    return out, delivered


def gather_exact_loop(
    serve_fn, ids, owner0, out, delivered, *, world, axis, cap, oob, exact=True
):
    """Multi-round exchange driver shared by the device and host-tier
    gathers: repeat ``_gather_round`` until every id is delivered (psum of
    the undelivered count is the uniform while_loop condition)."""
    owner_eff = jnp.where(delivered, world, owner0)
    out, delivered = _gather_round(
        serve_fn, ids, owner_eff, out, delivered,
        world=world, axis=axis, cap=cap, oob=oob,
    )
    if not exact:
        return out

    def remaining(delivered):
        return lax.psum(jnp.sum(~delivered).astype(jnp.int32), axis)

    def body(state):
        out, delivered = state[0], state[1]
        owner_eff = jnp.where(delivered, world, owner0)
        out, delivered = _gather_round(
            serve_fn, ids, owner_eff, out, delivered,
            world=world, axis=axis, cap=cap, oob=oob,
        )
        return out, delivered, remaining(delivered)

    out, delivered, _ = lax.while_loop(
        lambda s: s[2] > 0, body, (out, delivered, remaining(delivered))
    )
    return out


def _gather_shard_a2a(
    shard: Array,
    ids: Array,
    *,
    plan: PartitionPlan,
    axis: str,
    cap: int,
    exact: bool = True,
    dedup: bool = False,
    local_kernel: str = "ring",
):
    """Per-device distributed gather: bucket → a2a ids → local take → a2a rows
    → un-permute (gather_op_impl_nccl.cu:101-170 analog).

    With ``exact=True`` (default) the round repeats under a ``while_loop``
    until every id is delivered — the static-shape equivalent of the
    reference's dynamic alltoallv, which never drops.  ``exact=False`` is the
    single-round capped path (overflow rows are zero).

    ``dedup=True`` sorts + uniques the local ids before the exchange and
    expands afterward (the reference's sorted-unique-ids heuristic,
    gather_op.cpp:118-120 / sort_unique_indices_func.cu): wire volume and
    local-take work scale with UNIQUE ids, worth it when the batch repeats
    ids (raw gathers outside the pre-deduped multilayer-sampler path)."""
    world = plan.world
    idt = index_dtype(plan)
    ids = ids.astype(idt)
    B = ids.shape[0]
    oob = jnp.asarray(plan.n, idt)  # sentinel: one past the last logical row

    if dedup:
        # sort; keep one representative per run, rest -> oob (zero rows)
        sids = jnp.sort(ids)
        leader = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
        uids = jnp.where(leader, sids, oob)
        urows = _gather_shard_a2a(
            shard, uids, plan=plan, axis=axis, cap=cap, exact=exact, dedup=False,
            local_kernel=local_kernel,
        )
        # expand: each original id finds its representative's position
        pos = jnp.searchsorted(sids, ids)
        return jnp.take(urows, jnp.clip(pos, 0, B - 1), axis=0)

    owner0 = plan.owner(ids).astype(jnp.int32)
    # out-of-range ids are served as zero rows and never enter a bucket
    in_range = (ids >= 0) & (ids < oob)

    row_width = math.prod(shard.shape[1:])
    out = jnp.zeros((B, row_width), shard.dtype)
    delivered = ~in_range
    serve = functools.partial(
        _serve_requests, shard, plan=plan, oob=oob, local_kernel=local_kernel
    )
    return gather_exact_loop(
        serve, ids, owner0, out, delivered,
        world=world, axis=axis, cap=cap, oob=oob, exact=exact,
    )


def _scatter_round(shard, ids, rows, owner_eff, delivered, *, plan, axis, cap, oob, accumulate):
    """One bucket → a2a (ids, rows) → local write round.  Returns
    (shard, delivered)."""
    world = plan.world
    bucket, src_pos = bucket_by_owner(ids, owner_eff, world, cap, oob)

    # gather the rows into bucket order; padding rows point past the end
    pos = src_pos.reshape(world * cap)
    safe_pos = jnp.where(pos >= 0, pos, rows.shape[0])
    row_bucket = jnp.take(rows, safe_pos, axis=0, mode="fill", fill_value=0)

    recv_ids = lax.all_to_all(bucket, axis, split_axis=0, concat_axis=0, tiled=True).reshape(
        world * cap
    )
    recv_rows = lax.all_to_all(
        row_bucket.reshape(world, cap, -1), axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(world * cap, -1)

    valid = recv_ids < oob
    slots = jnp.where(valid, plan.local_slot(jnp.where(valid, recv_ids, 0)), shard.shape[0])
    rws = recv_rows.astype(shard.dtype).reshape(-1, *shard.shape[1:])
    if accumulate:
        shard = shard.at[slots].add(rws, mode="drop")
    else:
        shard = shard.at[slots].set(rws, mode="drop")
    delivered = delivered.at[safe_pos].set(True, mode="drop")
    return shard, delivered


def _scatter_shard_a2a(
    shard: Array,
    ids: Array,
    rows: Array,
    *,
    plan: PartitionPlan,
    axis: str,
    cap: int,
    accumulate: bool,
    exact: bool = True,
):
    """Per-device distributed scatter (scatter_op_impl_nccl.cu analog).
    ``exact=True`` loops rounds until every row is delivered (no drops);
    each source row is sent in exactly one round, so ``accumulate=True``
    sums every contribution exactly once."""
    world = plan.world
    idt = index_dtype(plan)
    ids = ids.astype(idt)
    oob = jnp.asarray(plan.n, idt)
    owner0 = plan.owner(ids).astype(jnp.int32)
    in_range = (ids >= 0) & (ids < oob)

    delivered = ~in_range  # out-of-range writes are dropped (reference OOB semantics)
    owner_eff = jnp.where(delivered, world, owner0)
    shard, delivered = _scatter_round(
        shard, ids, rows, owner_eff, delivered,
        plan=plan, axis=axis, cap=cap, oob=oob, accumulate=accumulate,
    )
    if not exact:
        return shard

    def remaining(delivered):
        return lax.psum(jnp.sum(~delivered).astype(jnp.int32), axis)

    def body(state):
        shard, delivered = state[0], state[1]
        owner_eff = jnp.where(delivered, world, owner0)
        shard, delivered = _scatter_round(
            shard, ids, rows, owner_eff, delivered,
            plan=plan, axis=axis, cap=cap, oob=oob, accumulate=accumulate,
        )
        return shard, delivered, remaining(delivered)

    shard, delivered, _ = lax.while_loop(
        lambda s: s[2] > 0, body, (shard, delivered, remaining(delivered))
    )
    return shard


def _gather_shard_allgather(shard: Array, ids: Array, *, plan: PartitionPlan, axis: str):
    """Exact fallback: all_gather ids, masked local take, psum_scatter rows."""
    world = plan.world
    me = lax.axis_index(axis)
    B = ids.shape[0]
    all_ids = lax.all_gather(ids, axis_name=axis).reshape(world * B)
    owner = plan.owner(all_ids)
    mine = owner == me
    slots = plan.local_slot(all_ids)
    rows = local_take(shard, slots)  # always flat [W*B, D]
    rows = jnp.where(mine[:, None], rows, jnp.zeros_like(rows))
    return lax.psum_scatter(rows, axis_name=axis, scatter_dimension=0, tiled=True)


# ---------------------------------------------------------------------------
# Hierarchical (node x device) two-stage gather
# ---------------------------------------------------------------------------


def _exchange_gather(shard, ids, owner, world, axis, cap, plan):
    """One bucket→a2a→take→a2a-back→unpermute round over ``axis``.

    ids may contain the OOB sentinel (plan.n); such slots must already carry
    an evenly-spread fake owner so no bucket overflows.  Returns [B, D] rows
    aligned with ids (garbage rows where ids were OOB)."""
    idt = ids.dtype
    oob = jnp.asarray(plan.n, idt)
    bucket, src_pos = bucket_by_owner(ids, owner, world, cap, oob)
    req = lax.all_to_all(bucket, axis, split_axis=0, concat_axis=0, tiled=True).reshape(
        world * cap
    )
    valid = req < oob
    slots = jnp.where(valid, plan.local_slot(jnp.where(valid, req, 0)), 0)
    rows = local_take(shard, slots)
    rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    back = lax.all_to_all(
        rows.reshape(world, cap, -1), axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(world * cap, -1)
    out = jnp.zeros((ids.shape[0], back.shape[1]), back.dtype)
    pos = src_pos.reshape(world * cap)
    pos = jnp.where(pos >= 0, pos, ids.shape[0])
    return out.at[pos].set(back, mode="drop")


def _gather_shard_hierarchy(
    shard: Array,
    ids: Array,
    *,
    plan: PartitionPlan,
    node_axis: str,
    device_axis: str,
    n_nodes: int,
    per_node: int,
    cap1: int,
    cap2: int,
):
    """Two-stage hierarchical gather (wholememory_gather_hierarchy analog,
    gather_op_impl_hierarchy.cu:34-154): route requests to the owning NODE
    along the cross-node axis (same device column, i.e. DCN), then run the
    flat exchange within the node along the device axis (ICI)."""
    idt = index_dtype(plan)
    ids = ids.astype(idt)
    B = ids.shape[0]
    oob = jnp.asarray(plan.n, idt)
    owner = plan.owner(ids)
    onode = owner // per_node

    # --- stage 1: bucket by owning node, exchange along the node axis ---
    bucket1, pos1 = bucket_by_owner(ids, onode, n_nodes, cap1, oob)
    req1 = lax.all_to_all(
        bucket1, node_axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(n_nodes * cap1)

    # --- stage 2: flat exchange within the node (device axis) ---
    valid1 = req1 < oob
    odev = jnp.where(
        valid1,
        plan.owner(jnp.where(valid1, req1, 0)) % per_node,
        jnp.arange(req1.shape[0], dtype=jnp.int32) % per_node,  # spread padding
    )
    rows1 = _exchange_gather(shard, req1, odev, per_node, device_axis, cap2, plan)

    # --- reverse stage 1: send rows back along the node axis ---
    back = lax.all_to_all(
        rows1.reshape(n_nodes, cap1, -1), node_axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(n_nodes * cap1, -1)
    out = jnp.zeros((B, back.shape[1]), back.dtype)
    pos = pos1.reshape(n_nodes * cap1)
    pos = jnp.where(pos >= 0, pos, B)
    return out.at[pos].set(back, mode="drop")


def gather_hierarchical(
    data: Array,
    ids: Array,
    *,
    plan: PartitionPlan,
    mesh: Mesh,
    node_axis: str = "node",
    device_axis: str = "device",
    capacity_factor: float = 2.0,
) -> Array:
    """Gather over a 2-D (node, device) mesh with two-stage routing
    (MT_HIERARCHY analog).  ``data`` is sharded ``P((node, device), None)``;
    shard index = node*per_node + device, matching the plan's owner order."""
    n_nodes = mesh.shape[node_axis]
    per_node = mesh.shape[device_axis]
    world = n_nodes * per_node
    check_input(plan.world == world, "plan world != mesh size")
    B_global = ids.shape[0]
    check_input(B_global % world == 0, "global batch must divide mesh size")
    B_local = B_global // world
    cap1 = _bucket_cap(B_local, n_nodes, capacity_factor)
    cap2 = _bucket_cap(n_nodes * cap1, per_node, capacity_factor)

    if data.ndim == 1:
        out = gather_hierarchical(
            data[:, None], ids, plan=plan, mesh=mesh, node_axis=node_axis,
            device_axis=device_axis, capacity_factor=capacity_factor,
        )
        return out[:, 0]

    fn = _build_hier_fn(plan, mesh, node_axis, device_axis, cap1, cap2, data.ndim)
    return fn(data, ids)


# ---------------------------------------------------------------------------
# Ragged (exact alltoallv) path — TPU only
# ---------------------------------------------------------------------------


def _gather_shard_ragged(
    shard: Array,
    ids: Array,
    *,
    plan: PartitionPlan,
    axis: str,
    recv_capacity: int,
):
    """Exact alltoallv via lax.ragged_all_to_all (unsupported on XLA:CPU)."""
    world = plan.world
    me = lax.axis_index(axis)
    B = ids.shape[0]
    idt = index_dtype(plan)
    ids = ids.astype(idt)
    owner = plan.owner(ids)
    order = jnp.argsort(owner, stable=True)
    sids = ids[order]

    send_counts = jnp.bincount(owner, length=world).astype(jnp.int32)
    send_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(send_counts)[:-1].astype(jnp.int32)]
    )
    C = lax.all_gather(send_counts, axis_name=axis)  # C[v, w] = count v -> w
    recv_counts = C[:, me].astype(jnp.int32)
    recv_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(recv_counts)[:-1].astype(jnp.int32)]
    )
    req_out_off = (jnp.cumsum(C, axis=0) - C)[me].astype(jnp.int32)
    reply_out_off = (jnp.cumsum(C, axis=1) - C)[:, me].astype(jnp.int32)

    recv_ids = lax.ragged_all_to_all(
        sids,
        jnp.full((recv_capacity,), plan.n, idt),
        send_offsets,
        send_counts,
        req_out_off,
        recv_counts,
        axis_name=axis,
    )
    valid = recv_ids < plan.n
    slots = jnp.where(valid, plan.local_slot(jnp.where(valid, recv_ids, 0)), 0)
    rows = local_take(shard, slots)
    out_sorted = lax.ragged_all_to_all(
        rows,
        jnp.zeros((B,) + rows.shape[1:], rows.dtype),
        recv_offsets,
        recv_counts,
        reply_out_off,
        send_counts,
        axis_name=axis,
    )
    out = jnp.zeros_like(out_sorted)
    return out.at[order].set(out_sorted)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _bucket_cap(B_local: int, world: int, factor: float) -> int:
    # mean load per owner times `factor`, plus an additive margin that covers
    # the binomial tail at small batch sizes
    mean = -(-B_local // world)
    cap = _round_up(int(mean * factor) + 16, 8)
    return min(cap, B_local)


@functools.lru_cache(maxsize=None)
def _build_gather_fn(plan, mesh, axis, method, cap, dedup=False, local_kernel="ring", data_ndim=2):
    """Jitted shard_map gather, cached per static config — eager callers pay
    compile once, not per-op dispatch through the mesh."""
    if method == "allgather":
        body = functools.partial(_gather_shard_allgather, plan=plan, axis=axis)
    elif method == "a2a":
        body = functools.partial(
            _gather_shard_a2a, plan=plan, axis=axis, cap=cap, exact=True,
            dedup=dedup, local_kernel=local_kernel,
        )
    elif method == "a2a_capped":
        body = functools.partial(
            _gather_shard_a2a, plan=plan, axis=axis, cap=cap, exact=False,
            dedup=dedup, local_kernel=local_kernel,
        )
    elif method == "ragged":
        body = functools.partial(
            _gather_shard_ragged, plan=plan, axis=axis, recv_capacity=cap
        )
    else:
        raise ValueError(f"unknown gather method {method!r}")
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, *([None] * (data_ndim - 1))), P(axis)),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _build_scatter_fn(plan, mesh, axis, cap, accumulate, donate, exact=True, data_ndim=2):
    body = functools.partial(
        _scatter_shard_a2a, plan=plan, axis=axis, cap=cap, accumulate=accumulate,
        exact=exact,
    )
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, *([None] * (data_ndim - 1))), P(axis), P(axis, None)),
            out_specs=P(axis, *([None] * (data_ndim - 1))),
            check_vma=False,
        ),
        donate_argnums=(0,) if donate else (),
    )


@functools.lru_cache(maxsize=None)
def _build_hier_fn(plan, mesh, node_axis, device_axis, cap1, cap2, data_ndim=2):
    n_nodes = mesh.shape[node_axis]
    per_node = mesh.shape[device_axis]
    body = functools.partial(
        _gather_shard_hierarchy,
        plan=plan,
        node_axis=node_axis,
        device_axis=device_axis,
        n_nodes=n_nodes,
        per_node=per_node,
        cap1=cap1,
        cap2=cap2,
    )
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P((node_axis, device_axis), *([None] * (data_ndim - 1))),
                P((node_axis, device_axis)),
            ),
            out_specs=P((node_axis, device_axis), None),
            check_vma=False,
        )
    )


def gather(
    data: Array,
    ids: Array,
    *,
    plan: PartitionPlan,
    mesh: Mesh,
    axis: str = "data",
    method: str = "auto",
    capacity_factor: float = 2.0,
    dedup: bool = False,
    local_kernel: str = "ring",
) -> Array:
    """Gather rows by logical id from a row-sharded table.

    Args:
      data: physical table ``[world*capacity, D]`` sharded ``P(axis, None)``.
      ids: logical row ids, sharded ``P(axis)`` (each device holds its batch).
        Out-of-range ids yield zero rows.
      plan: the table's partition plan.
      method: 'a2a' (default — EXACT multi-round padded-bucket all-to-all;
        never drops), 'a2a_capped' (single round, bucket-overflow ids are
        dropped to zero rows — monitor with :func:`gather_overflow`),
        'ragged' (exact alltoallv; TPU only), 'allgather' (exact, W× comm),
        'hierarchy' (two-stage node×device routing; requires
        ``axis=(node_axis, device_axis)`` — a hierarchy-mesh table).
      capacity_factor: per-owner, per-round bucket headroom over the uniform
        load.  For 'a2a' this is a performance knob (skew beyond it costs
        extra rounds, never correctness); for 'a2a_capped' it bounds drops.
      dedup: sort-unique the ids before the exchange (reference
        sorted-ids heuristic, gather_op.cpp:118-120) — wire volume scales
        with unique ids; enable for batches with many repeats.
      local_kernel: 'ring' (single-row DMA ring) or 'sorted' (windowed
        multi-row DMA + MXU one-hot select with exact repair — fastest when
        the served requests are sorted and dense; pair with ``dedup=True``.
        See ops.choose_gather_kernel for the crossover).
    Returns:
      rows ``[B, D]`` with the same sharding as ``ids``.
    """
    world = plan.world
    check_input(axis_size(mesh, axis) == world, "mesh axis size != plan.world")
    if world == 1:
        phys = plan.physical_index(ids)
        if local_kernel == "sorted":
            from .gather_pallas import local_take_sorted

            return local_take_sorted(data, phys)
        return local_take(data, phys)

    if data.ndim == 1:  # 1-D tables (e.g. CSR row_ptr/col): lift to [n, 1]
        out = gather(
            data[:, None], ids, plan=plan, mesh=mesh, axis=axis,
            method=method, capacity_factor=capacity_factor, dedup=dedup,
        )
        return out[:, 0]

    if method == "auto":
        method = "a2a"

    if method == "hierarchy":
        check_input(
            isinstance(axis, tuple) and len(axis) == 2,
            "method='hierarchy' needs a 2-axis table (axis=(node, device))",
        )
        return gather_hierarchical(
            data, ids, plan=plan, mesh=mesh, node_axis=axis[0],
            device_axis=axis[1], capacity_factor=capacity_factor,
        )

    B_global = ids.shape[0]
    check_input(B_global % world == 0, "global batch must divide mesh axis")
    B_local = B_global // world

    if method in ("a2a", "a2a_capped"):
        cap = _bucket_cap(B_local, world, capacity_factor)
    elif method == "ragged":
        cap = _round_up(max(int(B_local * capacity_factor), world, 8), 8)
        cap = min(cap, world * B_local)
    else:
        cap = 0
    fn = _build_gather_fn(plan, mesh, axis, method, cap, dedup, local_kernel, data.ndim)
    return fn(data, ids)


@functools.lru_cache(maxsize=None)
def _build_overflow_fn(plan, mesh, axis, cap):
    def body(ids):
        # out-of-range ids (e.g. sampler padding >= n) are served as zero
        # rows locally and never enter a bucket (_gather_shard_a2a's
        # in_range) — excluding them here keeps the probe from reporting
        # phantom overflow on padded batches
        in_range = (ids >= 0) & (ids < plan.n)
        owner = jnp.where(
            in_range, plan.owner(jnp.where(in_range, ids, 0)), plan.world
        )
        counts = jnp.bincount(owner, length=plan.world)
        dropped = jnp.sum(jnp.maximum(counts - cap, 0))
        return lax.psum(dropped.reshape(1), axis_name=axis)

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P(axis),), out_specs=P(), check_vma=False
        )
    )


def gather_overflow(
    ids: Array,
    *,
    plan: PartitionPlan,
    mesh: Mesh,
    axis: str = "data",
    capacity_factor: float = 2.0,
) -> Array:
    """Number of ids a single capped round would overflow at the current
    capacity.  For ``method='a2a_capped'`` this is the DROP count; for the
    exact default it is instead a proxy for the extra-round volume (overflow
    ids repeat in later rounds).  Call periodically in production to tune
    ``capacity_factor``."""
    world = plan.world
    if world == 1:
        return jnp.zeros((1,), jnp.int32)
    B_global = ids.shape[0]
    check_input(B_global % world == 0, "global batch must divide mesh axis")
    cap = _bucket_cap(B_global // world, world, capacity_factor)
    return _build_overflow_fn(plan, mesh, axis, cap)(ids)


def scatter(
    data: Array,
    ids: Array,
    rows: Array,
    *,
    plan: PartitionPlan,
    mesh: Mesh,
    axis: str = "data",
    accumulate: bool = False,
    capacity_factor: float = 2.0,
    donate: bool = False,
    exact: bool = True,
) -> Array:
    """Scatter rows into a row-sharded table by logical id; returns new table.

    ``exact=True`` (default) repeats the bucket exchange until every row is
    delivered — no silent drops under skewed id→owner distributions
    (reference alltoallv semantics); ``exact=False`` is the single-round
    capped fast path.  Duplicate ids: with ``accumulate=False`` the winning
    writer is unspecified (same caveat as the reference scatter); with
    ``accumulate=True`` all contributions sum (each exactly once, also across
    rounds).  ``donate=True`` updates the table buffer in place (no
    double-buffering of a huge table; the input array becomes invalid).
    """
    world = plan.world
    check_input(axis_size(mesh, axis) == world, "mesh axis size != plan.world")
    if world == 1:
        phys = plan.physical_index(ids)
        valid = (ids >= 0) & (ids < plan.n)
        if accumulate:
            return local_add(data, phys, rows.astype(data.dtype), mask=valid)
        return local_write(data, phys, rows.astype(data.dtype), mask=valid)

    if data.ndim == 1:
        out = scatter(
            data[:, None], ids, rows[:, None], plan=plan, mesh=mesh, axis=axis,
            accumulate=accumulate, capacity_factor=capacity_factor, donate=donate,
            exact=exact,
        )
        return out[:, 0]

    B_global = ids.shape[0]
    check_input(B_global % world == 0, "global batch must divide mesh axis")
    B_local = B_global // world
    cap = _bucket_cap(B_local, world, capacity_factor)
    fn = _build_scatter_fn(plan, mesh, axis, cap, accumulate, donate, exact, data.ndim)
    return fn(data, ids, rows)

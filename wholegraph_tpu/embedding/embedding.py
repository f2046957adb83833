"""Trainable distributed embedding tables.

TPU-native replacement for the reference's embedding layer (reference:
cpp/src/wholememory/embedding.{hpp,cpp} and the python wrapper
torch/embedding.py).  An embedding = a row-sharded parameter table + per-row
optimizer state slots (extra sharded arrays, the analog of the reference's
optimizer state WholeMemory tensors) + a global step counter.

Forward (``gather``) is the distributed gather of ops/gather.py
(wholememory_embedding_gather, embedding.cpp:1053).  Backward follows the
reference flow exactly (embedding_base::gather_gradient_apply,
embedding.cpp:146-300): bucket ids+grads by owner → all-to-all exchange →
sort + segment-sum dedup (dedup_indice_and_gradients, :261-269) → sparse
optimizer step on the touched rows of the local shard only.

JAX-idiomatic autodiff integration: instead of a torch autograd Function that
buffers (ids, grad) pairs, the training step makes the gathered rows an
explicit intermediate — ``rows = emb.gather(state, ids)``; the trainer takes
``jax.grad`` with respect to ``rows`` and feeds the row-gradients to
:meth:`Embedding.apply_gradients`.  This matches the reference's deferred
apply (EmbeddingLookupFn.backward just records, torch/embedding.py:214-238)
while keeping everything functional.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..memory.partition import PartitionPlan
from ..ops.gather import (
    _bucket_cap,
    axis_size as _axis_size,
    bucket_by_owner,
    gather as _gather_rows,
    index_dtype as _index_dtype,
)
from ..utils.error import check_input
from .optimizers import SGD, SparseOptimizer

Array = jax.Array

# apply-step ring config (see _optimizer_step); env-overridable for A/Bs
import os as _os

_APPLY_PER_STEP = int(_os.environ.get("WGTPU_APPLY_PER_STEP", "256"))
_APPLY_INFLIGHT = int(_os.environ.get("WGTPU_APPLY_INFLIGHT", "256"))
# fail fast at import with a clear message: bad ring knobs otherwise die only
# on hardware with an opaque Mosaic error (id_block=1024 must be a multiple
# of per_step; inflight is bounded by the ~496-DMA-semaphore kernel cap)
if _APPLY_PER_STEP < 1 or 1024 % _APPLY_PER_STEP:
    raise ValueError(
        f"WGTPU_APPLY_PER_STEP={_APPLY_PER_STEP} must divide the ring's "
        "id_block (1024)"
    )
if not 1 <= _APPLY_INFLIGHT <= 496:
    raise ValueError(
        f"WGTPU_APPLY_INFLIGHT={_APPLY_INFLIGHT} out of range [1, 496] "
        "(DMA-semaphore cap per kernel)"
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EmbeddingState:
    """Traced state: physical table + optimizer slot arrays + step counter."""

    table: Array
    slots: Dict[str, Array]
    step: Array

    def tree_flatten(self):
        names = tuple(sorted(self.slots))
        return (self.table, tuple(self.slots[n] for n in names), self.step), names

    @classmethod
    def tree_unflatten(cls, names, children):
        table, slot_vals, step = children
        return cls(table, dict(zip(names, slot_vals)), step)


def _dedup_sorted(ids: Array, grads: Array, oob) -> tuple:
    """Sort (ids, grads) by id and segment-sum duplicates.  Returns
    (unique_ids, summed_grads) padded with ``oob`` / zero rows
    (dedup_indice_and_gradients analog, embedding.cpp:261-269)."""
    R = ids.shape[0]
    order = jnp.argsort(ids)
    sids = ids[order]
    sgrads = grads[order].astype(jnp.float32)
    valid_row = sids < oob
    sgrads = jnp.where(valid_row[:, None], sgrads, 0.0)
    leader = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]]) & valid_row
    seg = jnp.maximum(jnp.cumsum(leader) - 1, 0)
    seg_grads = jax.ops.segment_sum(sgrads, seg, num_segments=R)
    uids = jax.ops.segment_min(sids, seg, num_segments=R)
    return uids, seg_grads


def _optimizer_step(
    shard, slot_shards, uids, seg_grads, step, lr, *, plan, opt, slot_names,
    unique_chunk=None,
):
    """Sparse optimizer step on the touched local rows (ids are logical ids
    owned by this shard; entries >= plan.n are padding).

    ``unique_chunk``: when set (a multiple of the ring id_block 1024),
    process the id buffer in chunks of that size under a lax.while_loop
    that stops after the LAST chunk containing a valid id — apply cost
    becomes proportional to the REAL touched rows, not the worst-case
    buffer (the reference steps only deduped touched rows,
    embedding.cpp:261-269; sampler unique buffers carry their valid ids as
    a prefix, so trailing padding chunks are skipped entirely).  Exact for
    ANY id layout: the loop bound is the last valid position, not a prefix
    assumption.

    The optimizer row movement (read + write of table + every slot) is the
    apply step's dominant cost; on TPU with NATIVE-layout state the rows
    move through the pallas DMA ring (~126 GB/s) instead of XLA
    take/.at[].set (~42 GB/s measured, scripts/exp_apply.py).  Optimizer
    math is elementwise, so it runs directly on the native row shape."""
    R = uids.shape[0]
    if unique_chunk is not None and R > unique_chunk:
        C = unique_chunk
        oob = jnp.asarray(plan.n, uids.dtype)
        pad = -R % C
        uids_p = (
            jnp.concatenate([uids, jnp.full((pad,), oob, uids.dtype)])
            if pad else uids
        )
        grads_p = (
            jnp.concatenate(
                [seg_grads, jnp.zeros((pad, seg_grads.shape[1]),
                                      seg_grads.dtype)]
            )
            if pad else seg_grads
        )
        nmax = uids_p.shape[0] // C
        valid = uids_p < oob
        iot = jnp.arange(uids_p.shape[0], dtype=jnp.int32)
        last_valid = jnp.max(jnp.where(valid, iot, -1))
        n_chunks = jnp.maximum((last_valid + C) // C, 0)  # 0 if none valid

        def body(state):
            k, shard, slot_shards = state
            uc = lax.dynamic_slice(uids_p, (k * C,), (C,))
            gc = lax.dynamic_slice(
                grads_p, (k * C, 0), (C, grads_p.shape[1])
            )
            shard, slot_shards = _optimizer_step(
                shard, slot_shards, uc, gc, step, lr,
                plan=plan, opt=opt, slot_names=slot_names,
            )
            return k + 1, shard, slot_shards

        _, shard, slot_shards = lax.while_loop(
            lambda s: s[0] < n_chunks, body,
            (jnp.int32(0), shard, tuple(slot_shards)),
        )
        return shard, tuple(slot_shards)

    oob = jnp.asarray(plan.n, uids.dtype)
    valid = uids < oob
    slots_local = plan.local_slot(jnp.where(valid, uids, 0))
    take_idx = jnp.where(valid, slots_local, 0)
    R = uids.shape[0]
    grads = seg_grads.reshape(R, *shard.shape[1:])
    use_ring = (
        shard.ndim == 3
        and jax.default_backend() == "tpu"
        and R >= 1024
    )
    if use_ring:
        from ..ops.gather_pallas import (
            _gather_rows_pallas3_impl,
            scatter_rows_pallas3,
        )

        # per_step=256 (not the ring default 1024): Mosaic fully unrolls
        # each ring's issue loop, and this program contains 2*(1+n_slots)
        # rings — 6 x 1024 unrolled DMA issues pushed the remote compile
        # past 25 minutes; 6 x 256 compiles like one standard ring at
        # ~0.15 us/step extra launch overhead.  The SMEM id block itself
        # stays 1024 (Mosaic requires it to match XLA's s32 tile — a 256
        # block fails layout verification on hardware); the unroll bound
        # rides the ring's second grid dimension instead.  n_inflight=256
        # (the r3 gather-ring optimum); both knobs env-overridable for ring
        # config A/Bs (read once at import).
        kb = dict(id_block=1024, per_step=_APPLY_PER_STEP,
                  n_inflight=_APPLY_INFLIGHT)
        # pad is ALWAYS >= 1 (a full extra block when R divides evenly,
        # ~8 us of ring time): pad positions read local row 0, so the
        # gather output's row R carries row 0's PRE-update bytes — the
        # dump-fix (below) needs them, and sourcing them from the gather
        # instead of slicing the table again keeps the table's only uses
        # at (gather, aliased scatter); an extra read between them forced
        # XLA to copy the full table per ring (measured: 7.7 -> 4.2
        # Mrows/s).
        pad = (-R % kb["id_block"]) or kb["id_block"]
        idx = jnp.concatenate(
            [take_idx.astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
        )
        pfull = _gather_rows_pallas3_impl(shard, idx, **kb).astype(jnp.float32)
        prow, old0 = pfull[:R], pfull[R]
        sfull = {
            n: _gather_rows_pallas3_impl(s, idx, **kb).astype(jnp.float32)
            for n, s in zip(slot_names, slot_shards)
        }
        srow = {n: v[:R] for n, v in sfull.items()}
        sold0 = {n: v[R] for n, v in sfull.items()}
        new_rows, new_srow = opt.update(prow, grads, srow, step, lr)

        # UNCONDITIONAL scatters with a row-0 dump + post-fix: per-DMA
        # `pl.when(valid)` guards cost ~2.7x on the scatter ring (measured
        # r4, scripts/exp_apply_scatter.py: masked 45-55 GB/s in every
        # ring config vs 124-186 unmasked — even with zero masked ids), so
        # invalid/padded slots all write to local row 0 (a benign torn
        # race) and row 0's CORRECT value is restored afterwards with one
        # dynamic-update-slice per table.  Observable state — including
        # row 0's optimizer slots when row 0 wasn't really touched — is
        # identical to the masked form (the mask= padding contract holds).
        wslots = jnp.concatenate([
            jnp.where(valid, slots_local, 0).astype(jnp.int32),
            jnp.zeros((pad,), jnp.int32),
        ])
        touch0 = valid & (slots_local == 0)
        exists0 = jnp.any(touch0)
        idx0 = jnp.argmax(touch0)

        def dump_scatter(tab, new_r, old0_row):
            rows_w = jnp.concatenate([
                new_r.astype(tab.dtype),
                jnp.zeros((pad, *new_r.shape[1:]), tab.dtype),
            ])
            fix = jnp.where(exists0, new_r[idx0], old0_row).astype(tab.dtype)
            tab = scatter_rows_pallas3(tab, wslots, rows_w, **kb)
            return jax.lax.dynamic_update_slice_in_dim(
                tab, fix[None], 0, axis=0
            )

        shard = dump_scatter(shard, new_rows, old0)
        new_slot_shards = tuple(
            dump_scatter(s, new_srow[n], sold0[n])
            for n, s in zip(slot_names, slot_shards)
        )
        return shard, new_slot_shards

    prow = jnp.take(shard, take_idx, axis=0).astype(jnp.float32)
    srow = {
        n: jnp.take(s, take_idx, axis=0).astype(jnp.float32)
        for n, s in zip(slot_names, slot_shards)
    }
    new_rows, new_srow = opt.update(prow, grads, srow, step, lr)

    write_idx = jnp.where(valid, slots_local, shard.shape[0])  # drop padding
    shard = shard.at[write_idx].set(new_rows.astype(shard.dtype), mode="drop")
    new_slot_shards = tuple(
        s.at[write_idx].set(new_srow[n].astype(s.dtype), mode="drop")
        for n, s in zip(slot_names, slot_shards)
    )
    return shard, new_slot_shards


def exchange_grads_exact(uids_l, ugrads_l, *, plan, axis, cap):
    """EXACT multi-round bucket exchange of locally-deduped (id, grad)
    contributions to their owners.  Each receiver merges every round into a
    pending accumulator (sorted-merge + segment-sum) statically sized at the
    global batch — its provable worst case.  Returns (pend_ids [P],
    pend_grads [P, D]) with ids ascending, padding ≥ plan.n."""
    world = plan.world
    oob = jnp.asarray(plan.n, uids_l.dtype)
    owner0 = jnp.where(
        uids_l < oob, plan.owner(jnp.where(uids_l < oob, uids_l, 0)), world
    ).astype(jnp.int32)
    B_local = uids_l.shape[0]
    # receiver worst case: every global batch id is mine — but I can never
    # receive more UNIQUE ids than rows I own, so cap at the shard capacity
    # (sources pre-dedup, receivers re-dedup each round, so the bound holds)
    P = min(world * B_local, -(-plan.capacity // 8) * 8)
    pend_ids = jnp.full((P,), oob, uids_l.dtype)
    pend_grads = jnp.zeros((P, ugrads_l.shape[1]), jnp.float32)

    def one_round(pend_ids, pend_grads, delivered):
        owner_eff = jnp.where(delivered, world, owner0)
        bucket, src_pos = bucket_by_owner(uids_l, owner_eff, world, cap, oob)
        pos = src_pos.reshape(world * cap)
        safe_pos = jnp.where(pos >= 0, pos, ugrads_l.shape[0])
        grad_bucket = jnp.take(ugrads_l, safe_pos, axis=0, mode="fill", fill_value=0)
        recv_ids = lax.all_to_all(
            bucket, axis, split_axis=0, concat_axis=0, tiled=True
        ).reshape(world * cap)
        recv_grads = lax.all_to_all(
            grad_bucket.reshape(world, cap, -1), axis, split_axis=0,
            concat_axis=0, tiled=True,
        ).reshape(world * cap, -1)
        # merge into pending: unique valid ids across all rounds <= P, and
        # _dedup_sorted packs them (ascending) into the prefix, so the
        # truncation back to P never discards a valid id
        m_ids, m_grads = _dedup_sorted(
            jnp.concatenate([pend_ids, recv_ids]),
            jnp.concatenate([pend_grads, recv_grads.astype(jnp.float32)]),
            oob,
        )
        delivered = delivered.at[safe_pos].set(True, mode="drop")
        return m_ids[:P], m_grads[:P], delivered

    def remaining(delivered):
        return lax.psum(jnp.sum(~delivered).astype(jnp.int32), axis)

    delivered = uids_l >= oob  # padding needs no delivery
    pend_ids, pend_grads, delivered = one_round(pend_ids, pend_grads, delivered)

    def body(state):
        pend_ids, pend_grads, delivered = state[0], state[1], state[2]
        pend_ids, pend_grads, delivered = one_round(pend_ids, pend_grads, delivered)
        return pend_ids, pend_grads, delivered, remaining(delivered)

    pend_ids, pend_grads, delivered, _ = lax.while_loop(
        lambda s: s[3] > 0, body,
        (pend_ids, pend_grads, delivered, remaining(delivered)),
    )
    return pend_ids, pend_grads


def _apply_grad_shard(
    shard: Array,
    slot_shards: tuple,
    ids: Array,
    grads: Array,
    mask: Array,
    step: Array,
    lr: Array,
    *,
    plan: PartitionPlan,
    axis: str,
    cap: int,
    opt: SparseOptimizer,
    slot_names: tuple,
    assume_unique: bool = False,
    unique_chunk: Optional[int] = None,
):
    """Per-device gradient apply (embedding.cpp:146-300 analog).

    Flow: mask padding → local dedup (sort + segment-sum, so duplicates
    never consume exchange capacity) → EXACT multi-round bucket exchange,
    with each receiver merging the rounds' (id, grad) pairs into a pending
    accumulator (sorted-merge + segment-sum) → ONE sparse optimizer step per
    unique id with its full summed gradient.  This matches the reference's
    dynamic-alltoallv-then-dedup semantics exactly for every optimizer: the
    pending buffer is statically sized at the global batch (the receiver's
    provable worst case — also what the reference's dynamic recv allocation
    pays under the same skew), rounds only add exchange volume, never
    precision loss or drops.

    ``assume_unique``: the caller warrants the (masked) ids are already
    unique per device — e.g. ``append_unique`` sampler output, whose
    contract guarantees it — so the local dedup (an argsort + a full
    [R, D] row permutation + segment-sum, ~3 extra HBM passes over the
    batch) is skipped.  Receivers still re-dedup in the multi-device
    exchange, so cross-device duplicates stay exact."""
    world = plan.world
    idt = _index_dtype(plan)
    ids = ids.astype(idt)
    oob = jnp.asarray(plan.n, idt)
    ids = jnp.where(mask & (ids >= 0) & (ids < oob), ids, oob)

    if assume_unique:
        uids_l = ids
        ugrads_l = jnp.where(
            (ids < oob)[:, None], grads.astype(jnp.float32), 0.0
        )
    else:
        # --- local pre-dedup: one contribution per unique id per device ---
        uids_l, ugrads_l = _dedup_sorted(ids, grads, oob)

    if world == 1:
        return _optimizer_step(
            shard, slot_shards, uids_l, ugrads_l, step, lr,
            plan=plan, opt=opt, slot_names=slot_names,
            unique_chunk=unique_chunk,
        )

    pend_ids, pend_grads = exchange_grads_exact(
        uids_l, ugrads_l, plan=plan, axis=axis, cap=cap
    )
    return _optimizer_step(
        shard, slot_shards, pend_ids, pend_grads, step, lr,
        plan=plan, opt=opt, slot_names=slot_names,
        unique_chunk=unique_chunk,
    )


@functools.lru_cache(maxsize=None)
def _build_apply_fn(emb: "Embedding", cap: int, slot_names: tuple,
                    assume_unique: bool = False,
                    unique_chunk: Optional[int] = None):
    """Jitted shard_map gradient-apply, cached per static config (eager
    callers pay compile once instead of per-op mesh dispatch)."""
    body = functools.partial(
        _apply_grad_shard,
        plan=emb.plan,
        axis=emb.axis,
        cap=cap,
        opt=emb.optimizer,
        slot_names=slot_names,
        assume_unique=assume_unique,
        unique_chunk=unique_chunk,
    )
    # donate table + slots: the sparse update must not double-buffer the
    # whole sharded table (in-place semantics, SURVEY §7 hard part)
    if emb.plan.world == 1:
        return jax.jit(body, donate_argnums=(0, 1))
    tspec = P(emb.axis, *([None] * len(emb._row_shape)))
    return jax.jit(
        jax.shard_map(
            body,
            mesh=emb.mesh,
            in_specs=(
                tspec,
                tuple(tspec for _ in slot_names),
                P(emb.axis),
                P(emb.axis, None),
                P(emb.axis),
                P(),
                P(),
            ),
            out_specs=(
                tspec,
                tuple(tspec for _ in slot_names),
            ),
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


@dataclasses.dataclass(frozen=True)
class Embedding:
    """Static embedding config (wholememory_embedding_t analog,
    embedding.h:74-244).  All methods are functional over EmbeddingState."""

    plan: PartitionPlan
    dim: int
    mesh: Mesh
    axis: str = "data"
    dtype: object = jnp.float32
    optimizer: SparseOptimizer = dataclasses.field(default_factory=SGD)
    # Store table + slots in the pallas kernels' NATIVE tile layout
    # ``[cap, dim//128, 128]``: the flat<->native reshape is a true relayout
    # that XLA re-runs EVERY step for loop-carried state (measured 18 vs 125
    # GB/s on the scatter ring), so mutable state lives native and only
    # per-batch rows / host views convert.  Auto-on when dim % 128 == 0.
    native_layout: bool = False

    # -- construction ---------------------------------------------------------

    @staticmethod
    def create(
        mesh: Mesh,
        n: int,
        dim: int,
        *,
        optimizer: Optional[SparseOptimizer] = None,
        dtype=jnp.float32,
        axis: str = "data",
        plan: Optional[PartitionPlan] = None,
        native_layout: Optional[bool] = None,
    ) -> "Embedding":
        world = _axis_size(mesh, axis)
        if plan is None:
            plan = PartitionPlan.equal(n, world)
        check_input(plan.world == world, "plan world != mesh axis size")
        if native_layout is None:
            native_layout = dim % 128 == 0
        return Embedding(
            plan=plan,
            dim=dim,
            mesh=mesh,
            axis=axis,
            dtype=dtype,
            optimizer=optimizer or SGD(),
            native_layout=native_layout and dim % 128 == 0,
        )

    @property
    def _row_shape(self) -> tuple:
        if self.native_layout:
            return (self.dim // 128, 128)
        return (self.dim,)

    @property
    def _sharding(self):
        return NamedSharding(
            self.mesh, P(self.axis, *([None] * len(self._row_shape)))
        )

    def table_2d(self, state: EmbeddingState) -> Array:
        """Flat ``[cap, dim]`` view of the (possibly native-layout) table —
        one relayout pass; for checkpoint/eval-rate access, not training
        loops."""
        if state.table.ndim == 2:
            return state.table
        return state.table.reshape(state.table.shape[0], self.dim)

    def as_sharded_table(self, state: EmbeddingState):
        """Wrap the table as a read-only :class:`ShardedTable` (flat view)."""
        from ..memory.sharded_table import ShardedTable

        return ShardedTable(self.table_2d(state), self.plan, self.mesh, self.axis)

    def init(
        self,
        key: Optional[Array] = None,
        initializer: Optional[Callable] = None,
    ) -> EmbeddingState:
        """Initialise table (+ zero optimizer slots, create_optimizer_states
        analog).  Default init: scaled normal."""
        cap = self.plan.total_physical_rows
        phys = (cap, self.dim)
        if initializer is None:
            scale = 1.0 / np.sqrt(max(self.dim, 1))
            initializer = lambda k, s, d: (jax.random.normal(k, s) * scale).astype(d)
        if key is None:
            key = jax.random.PRNGKey(0)
        make_t = jax.jit(
            lambda k: initializer(k, phys, self.dtype).reshape(cap, *self._row_shape),
            out_shardings=self._sharding,
        )
        table = make_t(key)
        make_z = jax.jit(
            lambda: jnp.zeros((cap, *self._row_shape), jnp.float32),
            out_shardings=self._sharding,
        )
        slots = {n: make_z() for n in self.optimizer.slot_names}
        return EmbeddingState(table, slots, jnp.zeros((), jnp.int32))

    def from_array(self, arr) -> EmbeddingState:
        """Build state from a host logical [n, dim] array."""
        arr = np.asarray(arr)
        check_input(arr.shape == (self.plan.n, self.dim), "array shape mismatch")
        cap = self.plan.total_physical_rows
        phys = np.zeros((cap, self.dim), dtype=arr.dtype)
        phys[self.plan.physical_index_np(np.arange(self.plan.n, dtype=np.int64))] = arr
        # numpy reshape to the native row shape is a VIEW (row-major match)
        table = jax.device_put(
            phys.astype(np.dtype(self.dtype)).reshape(cap, *self._row_shape),
            self._sharding,
        )
        zeros = np.zeros((cap, *self._row_shape), dtype=np.float32)
        slots = {
            n: jax.device_put(zeros.copy(), self._sharding)
            for n in self.optimizer.slot_names
        }
        return EmbeddingState(table, slots, jnp.zeros((), jnp.int32))

    def from_filelist(
        self, filelist, *, round_robin_size: int = 0
    ) -> EmbeddingState:
        """Build state by loading a binary filelist into the table
        (create_embedding_from_filelist analog, torch/embedding.py:462)."""
        from ..io.file_io import load_filelist

        tab = load_filelist(
            filelist,
            self.mesh,
            self.dim,
            np.dtype(self.dtype),
            axis=self.axis,
            plan=self.plan if not round_robin_size else None,
            round_robin_size=round_robin_size,
            expected_rows=self.plan.n,
        )
        check_input(tab.plan == self.plan, "loaded plan != embedding plan")
        cap = self.plan.total_physical_rows
        to_native = jax.jit(
            lambda t: t.reshape(cap, *self._row_shape), out_shardings=self._sharding
        )
        make_z = jax.jit(
            lambda: jnp.zeros((cap, *self._row_shape), jnp.float32),
            out_shardings=self._sharding,
        )
        slots = {n: make_z() for n in self.optimizer.slot_names}
        return EmbeddingState(to_native(tab.data), slots, jnp.zeros((), jnp.int32))

    # -- forward --------------------------------------------------------------

    def gather(self, state: EmbeddingState, ids: Array, **kw) -> Array:
        """Embedding lookup (wholememory_embedding_gather analog)."""
        return _gather_rows(
            state.table, ids, plan=self.plan, mesh=self.mesh, axis=self.axis, **kw
        )

    # -- backward / optimizer -------------------------------------------------

    def apply_gradients(
        self,
        state: EmbeddingState,
        ids: Array,
        grads: Array,
        lr,
        *,
        mask: Optional[Array] = None,
        capacity_factor: float = 2.0,
        assume_unique: bool = False,
        unique_chunk: Optional[int] = None,
    ) -> EmbeddingState:
        """Sparse update from (ids, row-gradients)
        (wholememory_embedding_gather_gradient_apply analog, embedding.cpp:1083).

        ids/grads are sharded over the mesh axis like a gather batch.
        Duplicate ids — within and across devices — are deduplicated with
        summed grads; the exchange is EXACT (multi-round, no drops — see
        :func:`wholegraph_tpu.ops.gather.gather`'s 'a2a' method).  ``mask``
        marks valid slots: masked-out ids (e.g. sampling padding) are
        excluded entirely, so padding never touches row 0's optimizer state.

        ``assume_unique=True``: the caller warrants the masked ids are
        already unique per device (``append_unique``'s contract — true for
        every ``MultilayerSample.unique_gids``), skipping the local dedup
        sort + [R, D] grad permutation (~3 HBM passes over the batch).
        ``unique_chunk`` (multiple of 1024): process the id buffer in
        chunks under a while_loop that stops after the last valid id —
        cost proportional to REAL touched rows (the reference steps only
        deduped touched rows, embedding.cpp:261-269), exact regardless of
        how ids are laid out.

        The input state's table and slot buffers are DONATED (updated in
        place; no double-buffering of the sharded table) — do not reuse the
        old state after this call.
        """
        world = self.plan.world
        step = state.step + 1
        lr = jnp.asarray(lr, jnp.float32)
        slot_names = tuple(sorted(state.slots))
        slot_vals = tuple(state.slots[n] for n in slot_names)
        if mask is None:
            mask = jnp.ones(ids.shape, bool)
        if unique_chunk is not None:
            check_input(
                unique_chunk >= 1024 and unique_chunk % 1024 == 0,
                "unique_chunk must be a positive multiple of 1024 (ring "
                "id_block)",
            )

        if world == 1:
            cap = 0
        else:
            B_global = ids.shape[0]
            check_input(B_global % world == 0, "global batch must divide mesh axis")
            cap = _bucket_cap(B_global // world, world, capacity_factor)

        fn = _build_apply_fn(self, cap, slot_names, bool(assume_unique),
                             unique_chunk)
        table, new_slots = fn(state.table, slot_vals, ids, grads, mask, step, lr)
        return EmbeddingState(table, dict(zip(slot_names, new_slots)), step)

    # -- training convenience -------------------------------------------------

    def make_train_step(self, loss_fn, lr, *, gather_kwargs=None,
                        apply_kwargs=None, donate=True):
        """Build a jitted step implementing the reference's training pattern
        (EmbeddingLookupFn forward + deferred sparse apply,
        torch/embedding.py:214-238 + 318):

            loss_fn(rows, *batch) -> scalar loss

        returns ``step(state, ids, *batch, mask=None) -> (state, loss)`` where
        the rows for ``ids`` are gathered, differentiated, and the
        row-gradients applied sparsely; ``mask`` (e.g. a sampler's
        ``unique_mask``) excludes padding slots from the sparse update.
        ``apply_kwargs`` forwards to :meth:`apply_gradients` (e.g.
        ``assume_unique=True`` for sampler unique buffers)."""
        gkw = gather_kwargs or {}
        akw = apply_kwargs or {}

        def step(state, ids, *batch, mask=None):
            rows = self.gather(state, ids, **gkw)
            if mask is not None:
                rows = rows * mask[:, None]
            loss, drows = jax.value_and_grad(loss_fn)(rows, *batch)
            new_state = self.apply_gradients(
                state, ids, drows, lr, mask=mask, **akw
            )
            return new_state, loss

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    # -- host access (tests / checkpoint) -------------------------------------

    def to_array(self, state: EmbeddingState) -> np.ndarray:
        from ..parallel.collectives import fetch_global

        phys = fetch_global(state.table).reshape(-1, self.dim)
        return phys[self.plan.physical_index_np(np.arange(self.plan.n, dtype=np.int64))]

    def slot_to_array(self, state: EmbeddingState, name: str) -> np.ndarray:
        from ..parallel.collectives import fetch_global

        phys = fetch_global(state.slots[name]).reshape(-1, self.dim)
        return phys[self.plan.physical_index_np(np.arange(self.plan.n, dtype=np.int64))]

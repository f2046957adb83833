"""CSR neighbor sampling (unweighted + weighted, without replacement).

TPU-native replacement for the reference sampling kernels:

* unweighted without replacement
  (reference: cpp/src/wholegraph_ops/unweighted_sample_without_replacement_func.cuh
  — take-all for deg<=K :39, blockwise radix-sort reservoir :132, sequential
  large_sample_kernel :62) — here a single *selection-sampling* algorithm:
  for slot j draw ``r_j ~ U[0, deg-j)`` with the counter RNG and map it to the
  (r_j+1)-th smallest not-yet-chosen neighbor position via a monotone fixpoint
  (O(K^2) vectorised compares, no data-dependent shapes, works for ANY degree
  — no max-degree bound needed);
* weighted A-Res reservoir sampling
  (reference: weighted_sample_without_replacement_func.cuh:45-61 key =
  log(u)/w, warp priority queue / radix top-K) — here a chunked scan over the
  neighbor window keeping a running top-K (lax.top_k), bounded by the graph's
  static max degree;
* the distributed (NCCL) path — gather row_ptr pairs, sample edge offsets
  locally, gather chosen cols (reference:
  unweighted_sample_without_replacement_nccl_func.cuh:52-290) — falls out for
  free: CSR arrays may be ShardedTables, in which case the row_ptr/col fetches
  are distributed gathers.

Output is the TPU-native padded form: ``neighbors [B, K]`` + boolean ``mask``
(XLA needs static shapes; the reference's compacted CSR is recoverable via
:func:`wholegraph_tpu.ops.graph_ops.padded_to_csr`).

Sampling is deterministic in (seed, hop, center id) — independent of batch
position and world size — and bit-exactly replayable on host
(tests/host_sampler.py), the reference's test-parity pillar (SURVEY §4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from . import rng

Array = jax.Array
TableLike = Union[Array, "ShardedTable"]  # noqa: F821 — duck-typed below

_HOP_STRIDE = 1 << 20  # rng key stride between hops (slot/offset fits below)


def _fetch(src: TableLike, ids: Array, **kw) -> Array:
    """Row fetch from a replicated array or a ShardedTable (distributed).
    Duck-typed on ``.gather`` to avoid a circular import with memory/."""
    if hasattr(src, "gather"):
        return src.gather(ids, **kw)
    return jnp.take(src, ids, axis=0, mode="clip")


def _fetch_elements(src: TableLike, ids: Array, **kw) -> Array:
    """Element fetch (4-byte values, e.g. col ids) — the sampler hot loop.

    XLA's scalar gather is issue-bound (~13 ns/element on v5e); on TPU large
    batches instead DMA each element's 128-lane block via the pallas row
    kernel and lane-select on the VPU (~1.6x; the dedup-skip variant in
    docs/ROADMAP.md is the next step)."""
    if (
        not hasattr(src, "gather")
        and jax.default_backend() == "tpu"
        and src.ndim == 1
        and ids.ndim == 1
        and ids.shape[0] >= 4096
    ):
        from .gather_pallas import _gather_rows_pallas3_impl

        E = src.shape[0]
        pad_e = -E % 128
        col2 = src
        if pad_e:
            col2 = jnp.concatenate([src, jnp.zeros((pad_e,), src.dtype)])
        col2 = col2.reshape(-1, 128)
        idc = jnp.clip(ids.astype(jnp.int32), 0, E - 1)
        blk = idc >> 7
        lane = idc & 127
        M = ids.shape[0]
        pad_m = -M % 1024
        if pad_m:
            blk = jnp.concatenate([blk, jnp.zeros((pad_m,), blk.dtype)])
        rows = _gather_rows_pallas3_impl(col2, blk)[:M, 0, :]  # [M, 128]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) == lane[:, None]
        )
        return jnp.sum(jnp.where(onehot, rows, 0), axis=1).astype(src.dtype)
    return _fetch(src, ids, **kw)


def _fetch_ptr_pairs(row_ptr: TableLike, centers: Array, **kw):
    """(row_ptr[c], row_ptr[c+1]) for every center.

    Two element gathers.  An interleaved-pair pallas block fetch (one DMA
    serving both ends) lived here behind ``_PTR_PAIR_FETCH`` through r3-r5;
    the r5 phase ladder measured the ptr fetch at ~0.0-0.2 ms of the 5 ms
    uniform step (exp_uniform_ladder.py) — nothing to win — so the path was
    deleted (docs/DESIGN.md 'Uniform sampler ladder'; git history has the
    implementation)."""
    return (
        _fetch(row_ptr, centers, **kw),
        _fetch(row_ptr, centers + 1, **kw),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SampleResult:
    """Padded sampling output.

    neighbors: [B, K] sampled neighbor node ids (garbage where ~mask)
    mask:      [B, K] slot validity
    positions: [B, K] sampled offsets within each center's adjacency list
    edge_ids:  [B, K] global edge indices (row_ptr[c] + position)
    degree:    [B]    center out-degrees
    """

    neighbors: Array
    mask: Array
    positions: Array
    edge_ids: Array
    degree: Array

    def tree_flatten(self):
        return (self.neighbors, self.mask, self.positions, self.edge_ids, self.degree), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


# ---------------------------------------------------------------------------
# Unweighted: selection sampling via rank-adjust fixpoint
# ---------------------------------------------------------------------------


def _sample_positions_uniform(deg: Array, K: int, seed: int, centers: Array, hop: int):
    """K distinct uniform positions in [0, deg) per center (padded/masked).

    For slot j, draws r_j = randint(seed, center, hop*S + j, deg - j) and maps
    it to the (r_j+1)-th smallest position not chosen by slots < j via the
    fixpoint p <- r_j + #{chosen <= p}.
    """
    B = deg.shape[0]
    sentinel = jnp.int32(1 << 30)
    sel0 = jnp.full((B, K), sentinel, jnp.int32)

    def body(j, sel):
        nj = jnp.maximum(deg - j, 1)
        r = rng.randint(seed, centers, hop * _HOP_STRIDE + j, nj)

        def fix(_, p):
            cnt = jnp.sum((sel <= p[:, None]).astype(jnp.int32), axis=1)
            return r + cnt

        # the monotone rank-adjust converges in <= j+1 applications (only
        # j earlier selections exist; each non-fixed application raises
        # the count by >= 1, and the count is bounded by j) — bit-equal to
        # running K, at ~half the total [B, K] compare-sum passes (r5)
        p = lax.fori_loop(0, j + 1, fix, r)
        return sel.at[:, j].set(p)

    sel = lax.fori_loop(0, K, body, sel0)

    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    take_all = deg[:, None] <= K
    pos = jnp.where(take_all, slots, sel)
    mask = slots < jnp.minimum(deg, K)[:, None]
    pos = jnp.where(mask, pos, 0)
    return pos, mask


# ---------------------------------------------------------------------------
# Weighted: A-Res reservoir via chunked running top-K
# ---------------------------------------------------------------------------


_NB = 4  # 128-lane weight blocks fetched per center per ladder iteration
_WEIGHTED_BUCKETS = 1  # degree buckets; >1 only pays off on skewed batches


def _merge_topk(best_keys, best_pos, key, K: int, off_of_topi):
    """Merge a [B, span] key chunk into the running (top-K keys, positions).

    Positions are recovered ARITHMETICALLY from the top-k indices
    (``off_of_topi(topi)`` for in-chunk winners, a K-wide take for carried
    ones) — a span-wide ``take_along_axis`` costs ~15 ms at [64K, 542] on
    v5e, ~as much as the top-k itself.  ``approx_max_k`` at
    recall_target=1.0 is bit-exact (values AND indices, incl. -inf rows and
    ties — verified on hardware, scripts/exp_topk.py) and lowers to the TPU
    PartialReduce instead of a full sort."""
    merged = jnp.concatenate([best_keys, key], axis=1)
    topk, topi = lax.approx_max_k(
        merged, K, recall_target=1.0, aggregate_to_topk=True
    )
    topi = topi.astype(jnp.int32)
    carried = jnp.take_along_axis(best_pos, jnp.minimum(topi, K - 1), axis=1)
    return topk, jnp.where(topi < K, carried, off_of_topi(topi))


def _ladder_run(body, init, total_iters: int, needed: Array):
    """Run ``body`` the smallest power-of-two number of iterations covering
    the batch's actual need (lax.switch over precompiled levels); iterations
    past a center's degree contribute only -inf keys, so every level is
    bit-identical on the centers it covers."""
    levels = []
    c = 1
    while c < total_iters:
        levels.append(c)
        c *= 2
    levels.append(total_iters)
    if len(levels) == 1:
        return lax.fori_loop(0, total_iters, body, init)
    idx = jnp.sum(needed > jnp.asarray(levels, jnp.int32)).astype(jnp.int32)
    return lax.switch(
        jnp.clip(idx, 0, len(levels) - 1),
        [
            (lambda l: (lambda _: lax.fori_loop(0, l, body, init)))(l)
            for l in levels
        ],
        None,
    )


def _weighted_block_ladder(
    start: Array, deg: Array, K: int, seed: int, centers: Array, hop: int,
    weights: Array, max_degree: int,
):
    """A-Res over whole 128-lane WEIGHT BLOCKS: instead of fetching each
    window element (XLA scalar gather, ~13-20 ns/element — 0.7 s/batch at
    chunk 512), DMA each center's enclosing blocks of the [E/128, 128]
    weight view with the pallas row ring (~8 ns per 128 lanes) and compute
    keys for every lane directly, masking lanes outside [start, start+deg).
    Key set per (center, offset) is identical to the element path, so the
    selected top-K is bit-equal."""
    B = start.shape[0]
    neg_inf = jnp.float32(-jnp.inf)
    E = weights.shape[0]
    pad_e = -E % 128
    w2 = weights.astype(jnp.float32)
    if pad_e:
        w2 = jnp.concatenate([w2, jnp.zeros((pad_e,), jnp.float32)])
    w2 = w2.reshape(-1, 128)
    nblk_tab = w2.shape[0]
    span = _NB * 128
    total_iters = max(-(-(127 + max_degree) // span), 1)
    blk0 = start >> 7
    s_lane = start & 127
    lane_iota = jnp.arange(span, dtype=jnp.int32)[None, :]
    cb = jnp.broadcast_to(centers[:, None], (B, span))

    from .gather_pallas import _gather_rows_pallas3_impl

    def body(c, carry):
        best_keys, best_pos = carry
        bids = blk0[:, None] + c * _NB + jnp.arange(_NB, dtype=jnp.int32)[None, :]
        flat = jnp.clip(bids, 0, nblk_tab - 1).reshape(-1)
        pad_m = -flat.shape[0] % 1024
        if pad_m:
            flat = jnp.concatenate([flat, jnp.zeros((pad_m,), flat.dtype)])
        blocks = _gather_rows_pallas3_impl(w2, flat)[: B * _NB]
        w = blocks.reshape(B, span)
        offs = c * span + lane_iota - s_lane[:, None]
        valid = (offs >= 0) & (offs < deg[:, None])
        offs = jnp.where(valid, offs, 0)
        u = rng.rand_uniform(seed, cb, hop * _HOP_STRIDE + offs)
        key = jnp.where(
            valid & (w > 0), jnp.log(jnp.maximum(u, 1e-20)) / w, neg_inf
        )
        return _merge_topk(
            best_keys, best_pos, key, K,
            lambda topi: c * span + (topi - K) - s_lane[:, None],
        )

    init = (jnp.full((B, K), neg_inf, jnp.float32), jnp.zeros((B, K), jnp.int32))
    needed = jnp.max(-(-(s_lane + deg) // span))

    def ladder_path(_):
        return _ladder_run(body, init, total_iters, needed)

    def make_single_shot(nblk: int):
        """Low-degree fast path: when the whole batch's adjacencies fit in
        each center's ``nblk`` enclosing 128-lane blocks (max(s_lane + deg)
        <= nblk*128 — the common GNN regime: actual degrees far below the
        declared max), fetch only those blocks, compute keys on
        [B, nblk*128], and take the top-K in ONE approx_max_k with positions
        recovered arithmetically — no running-merge carry at all.  The key
        per (center, offset) is the same hash as the ladder's, so the
        selected set is bit-equal (same multiset into the same exact
        top-K).  nblk=1 (deg + lane offset inside one block — 75% of a
        deg-32 batch) halves the DMA descriptors, the key hashing/log work
        AND the top-K width versus nblk=2; the degree-bucketed dispatch in
        _sample_positions_weighted sorts centers so whole buckets qualify."""

        def single_shot(_):
            spanS = nblk * 128
            bids = blk0[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
            fl = jnp.clip(bids, 0, nblk_tab - 1).reshape(-1)
            pad_m = -fl.shape[0] % 1024
            if pad_m:
                fl = jnp.concatenate([fl, jnp.zeros((pad_m,), fl.dtype)])
            lanes = _gather_rows_pallas3_impl(w2, fl)[: B * nblk].reshape(
                B, spanS
            )
            offs = jnp.arange(spanS, dtype=jnp.int32)[None, :] - s_lane[:, None]
            valid = (offs >= 0) & (offs < deg[:, None])
            offs_c = jnp.where(valid, offs, 0)
            u = rng.rand_uniform(
                seed,
                jnp.broadcast_to(centers[:, None], (B, spanS)),
                hop * _HOP_STRIDE + offs_c,
            )
            key = jnp.where(
                valid & (lanes > 0),
                jnp.log(jnp.maximum(u, 1e-20)) / lanes,
                neg_inf,
            )
            topk, topi = lax.approx_max_k(
                key, K, recall_target=1.0, aggregate_to_topk=True
            )
            return topk, topi.astype(jnp.int32) - s_lane[:, None]

        return single_shot

    need = jnp.max(s_lane + deg)
    if K <= 128:
        best_keys, best_pos = lax.cond(
            need <= 128,
            make_single_shot(1),
            lambda _: lax.cond(
                need <= 2 * 128, make_single_shot(2), ladder_path, None
            ),
            None,
        )
    elif K <= 2 * 128:
        best_keys, best_pos = lax.cond(
            need <= 2 * 128, make_single_shot(2), ladder_path, None
        )
    else:
        best_keys, best_pos = ladder_path(None)
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = (slots < jnp.minimum(deg, K)[:, None]) & (best_keys > neg_inf)
    return jnp.where(mask, best_pos, 0), mask


# ---------------------------------------------------------------------------
# Weighted FUSED: one pair-block fetch serves keys AND neighbor values
# ---------------------------------------------------------------------------


def interleave_col_weights(col: Array, weights: Array) -> Array:
    """[ceil(E/128), 256] int32 pair-block table: lanes 0-127 = col block i,
    lanes 128-255 = the same weight block bitcast to int32.

    The weighted sampler's two block fetches cover the SAME 128-lane edge
    blocks — the weight lanes to compute A-Res keys, then (in `_fetch_cols`)
    the col lanes to read the selected neighbors.  Interleaving them makes
    each ~1KB descriptor serve both, halving the sampler's DMA descriptors
    (measured r4: the 2-block weight DMA alone is 2.66 ms at B=64K on v5e —
    the col fetch repaid the same cost).  Build ONCE per graph
    (`GraphStructure.with_weighted_fastpath`) — building inside the per-step
    jit would re-run two HBM passes over E every step."""
    E = col.shape[0]
    pad = -E % 128
    c = col.astype(jnp.int32)
    w = weights.astype(jnp.float32)
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad,), jnp.int32)])
        w = jnp.concatenate([w, jnp.zeros((pad,), jnp.float32)])
    return jnp.concatenate(
        [
            c.reshape(-1, 1, 128),
            lax.bitcast_convert_type(w, jnp.int32).reshape(-1, 1, 128),
        ],
        axis=1,
    ).reshape(-1, 256)


def _fetch_pair_blocks(cw: Array, fl: Array, B: int, nblk: int):
    """DMA `fl` pair-block rows; returns (cols [B, nblk*128] int32,
    w [B, nblk*128] f32).  jnp.take off-TPU (CPU bit-equality tests)."""
    if jax.default_backend() == "tpu":
        from .gather_pallas import _gather_rows_pallas3_impl

        pad_m = -fl.shape[0] % 1024
        if pad_m:
            fl = jnp.concatenate([fl, jnp.zeros((pad_m,), fl.dtype)])
        pairs = _gather_rows_pallas3_impl(cw, fl)[: B * nblk]  # [B*nblk,2,128]
    else:
        pairs = jnp.take(cw, fl[: B * nblk], axis=0, mode="clip").reshape(
            B * nblk, 2, 128
        )
    pairs = pairs.reshape(B, nblk, 2, 128)
    cols = pairs[:, :, 0, :].reshape(B, nblk * 128)
    w = lax.bitcast_convert_type(pairs[:, :, 1, :], jnp.float32).reshape(
        B, nblk * 128
    )
    return cols, w


def _fetch_pair_slabs(cw: Array, blk_first: Array, B: int, nblk: int):
    """Pair-block window fetch with ONE slab descriptor per center
    (consecutive pair blocks are contiguous in HBM).  Returns
    (cols [B, nblk*128], w [B, nblk*128], shift [B]) where ``shift`` is the
    per-center lane shift the end-of-table clamp introduced (lane l holds
    table lane ``blk_first*128 + l - shift``).  Callers must fold ``shift``
    into their offset math; safe only where shifted-in EARLIER lanes cannot
    duplicate a previous ladder iteration's offsets (single-shot paths:
    earlier offsets are negative there and masked)."""
    nblk_tab = cw.shape[0]
    if (
        _SLAB_FETCH
        and jax.default_backend() == "tpu"
        and nblk_tab >= nblk
    ):
        from .gather_pallas import _gather_slabs_impl

        blk_s = jnp.clip(blk_first, 0, nblk_tab - nblk)
        # cw is the 2-D [nblk, 256] pair-block table; the slab kernel wants
        # the [nblk, 2, 128] plane view (free: same byte layout)
        pairs = _gather_slabs_impl(
            cw.reshape(nblk_tab, 2, 128), blk_s, nblk
        )  # [B*nblk, 2, 128]
        pairs = pairs.reshape(B, nblk, 2, 128)
        cols = pairs[:, :, 0, :].reshape(B, nblk * 128)
        w = lax.bitcast_convert_type(pairs[:, :, 1, :], jnp.float32).reshape(
            B, nblk * 128
        )
        return cols, w, (blk_first - blk_s) * 128
    bids = blk_first[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
    fl = jnp.clip(bids, 0, nblk_tab - 1).reshape(-1)
    cols, w = _fetch_pair_blocks(cw, fl, B, nblk)
    return cols, w, jnp.zeros((B,), jnp.int32)


def _merge_topk3(best_keys, best_pos, best_col, key, col_lanes, K: int,
                 off_of_topi):
    """`_merge_topk` carrying the neighbor VALUE alongside the position:
    in-chunk winners' cols are recovered by the fused lane select over the
    chunk's col lanes (a span-wide take_along_axis costs ~15 ms at
    [64K, 542]; the XLA one-hot materialises [B, K, span] in HBM)."""
    merged = jnp.concatenate([best_keys, key], axis=1)
    topk, topi = lax.approx_max_k(
        merged, K, recall_target=1.0, aggregate_to_topk=True
    )
    topi = topi.astype(jnp.int32)
    carried_pos = jnp.take_along_axis(best_pos, jnp.minimum(topi, K - 1), axis=1)
    carried_col = jnp.take_along_axis(best_col, jnp.minimum(topi, K - 1), axis=1)
    inlane = topi - K  # [B, K], valid where topi >= K (else < 0 -> sel 0)
    sel = _select_lanes(col_lanes, inlane, K)
    return (
        topk,
        jnp.where(topi < K, carried_pos, off_of_topi(topi)),
        jnp.where(topi < K, carried_col, sel),
    )


def _weighted_sample_fused(
    start: Array, deg: Array, K: int, seed: int, centers: Array, hop: int,
    cw: Array, max_degree: int,
):
    """A-Res over interleaved col+weight pair blocks: ONE DMA per enclosing
    block serves both the keys and the selected neighbor values, so the
    separate `_fetch_cols` block pass disappears.  Selection is bit-equal to
    `_weighted_block_ladder` + `_fetch_cols` (same key per (center, offset),
    same exact approx_max_k) — CPU-proven in tests/test_sampling.py.

    Returns (pos [B,K], mask [B,K], nbrs [B,K] — nbrs already -1-masked)."""
    B = start.shape[0]
    neg_inf = jnp.float32(-jnp.inf)
    nblk_tab = cw.shape[0]
    span = _NB * 128
    total_iters = max(-(-(127 + max_degree) // span), 1)
    blk0 = start >> 7
    s_lane = start & 127
    lane_iota = jnp.arange(span, dtype=jnp.int32)[None, :]
    cb = jnp.broadcast_to(centers[:, None], (B, span))

    def body(c, carry):
        best_keys, best_pos, best_col = carry
        bids = blk0[:, None] + c * _NB + jnp.arange(_NB, dtype=jnp.int32)[None, :]
        fl = jnp.clip(bids, 0, nblk_tab - 1).reshape(-1)
        cols, w = _fetch_pair_blocks(cw, fl, B, _NB)
        offs = c * span + lane_iota - s_lane[:, None]
        valid = (offs >= 0) & (offs < deg[:, None])
        offs_c = jnp.where(valid, offs, 0)
        u = rng.rand_uniform(seed, cb, hop * _HOP_STRIDE + offs_c)
        key = jnp.where(
            valid & (w > 0), jnp.log(jnp.maximum(u, 1e-20)) / w, neg_inf
        )
        return _merge_topk3(
            best_keys, best_pos, best_col, key, cols, K,
            lambda topi: c * span + (topi - K) - s_lane[:, None],
        )

    init = (
        jnp.full((B, K), neg_inf, jnp.float32),
        jnp.zeros((B, K), jnp.int32),
        jnp.zeros((B, K), jnp.int32),
    )
    needed = jnp.max(-(-(s_lane + deg) // span))

    def ladder_path(_):
        return _ladder_run(body, init, total_iters, needed)

    def make_single_shot(nblk: int):
        def single_shot(_):
            spanS = nblk * 128
            cols, w, shift = _fetch_pair_slabs(cw, blk0, B, nblk)
            # end-of-table slab clamp shifts the window down; shifted-in
            # earlier lanes map to NEGATIVE offs -> masked (no earlier
            # iteration exists in a single shot, so no duplicates)
            base = s_lane + shift
            offs = jnp.arange(spanS, dtype=jnp.int32)[None, :] - base[:, None]
            valid = (offs >= 0) & (offs < deg[:, None])
            offs_c = jnp.where(valid, offs, 0)
            u = rng.rand_uniform(
                seed,
                jnp.broadcast_to(centers[:, None], (B, spanS)),
                hop * _HOP_STRIDE + offs_c,
            )
            key = jnp.where(
                valid & (w > 0), jnp.log(jnp.maximum(u, 1e-20)) / w, neg_inf
            )
            topk, topi = lax.approx_max_k(
                key, K, recall_target=1.0, aggregate_to_topk=True
            )
            topi = topi.astype(jnp.int32)
            nbr = _select_lanes(cols, topi, K)
            return topk, topi - base[:, None], nbr

        return single_shot

    need = jnp.max(s_lane + deg)
    if K <= 128:
        best_keys, best_pos, best_col = lax.cond(
            need <= 128,
            make_single_shot(1),
            lambda _: lax.cond(
                need <= 2 * 128, make_single_shot(2), ladder_path, None
            ),
            None,
        )
    elif K <= 2 * 128:
        best_keys, best_pos, best_col = lax.cond(
            need <= 2 * 128, make_single_shot(2), ladder_path, None
        )
    else:
        best_keys, best_pos, best_col = ladder_path(None)
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = (slots < jnp.minimum(deg, K)[:, None]) & (best_keys > neg_inf)
    return (
        jnp.where(mask, best_pos, 0),
        mask,
        jnp.where(mask, best_col, -1),
    )


def _sample_positions_weighted(
    start: Array,
    deg: Array,
    K: int,
    seed: int,
    centers: Array,
    hop: int,
    weights: TableLike,
    max_degree: int,
    chunk: int = 512,
):
    """A-Res: key_e = log(u_e)/w_e, keep top-K keys (reference
    weighted_sample_without_replacement_func.cuh:45-61).

    Cost is proportional to the BATCH's actual max degree, not the graph's:
    a ``lax.switch`` over a power-of-two ladder of precompiled chunk counts
    picks, at runtime on device, the smallest level covering
    ``max(deg)`` — the static-shape analog of the reference's
    actual-degree-proportional warp top-K (func.cuh:169-219).  Chunks past a
    center's degree contribute only -inf keys, so every ladder level is
    bit-identical on the centers it covers.

    On TPU with replicated weights the hot path is
    :func:`_weighted_block_ladder` (whole-block weight DMAs); this chunked
    element-fetch form serves distributed/CPU cases and is bit-equal."""
    B = deg.shape[0]
    if (
        not hasattr(weights, "gather")
        and jax.default_backend() == "tpu"
        and getattr(weights, "ndim", 0) == 1
        and B >= 256
    ):
        # DEGREE-BUCKETED dispatch (round 3): the ladder's level selection
        # is batch-global — one high-degree center used to force every
        # center through all iterations.  Sort centers by their span need
        # (s_lane + deg) into G equal buckets; each bucket's
        # single-shot/ladder cond and ladder level then follow the
        # bucket's OWN max.  Keys are per (center, offset), so bucketing
        # cannot change any center's selected set (bit-equal; CPU-proven).
        # DEFAULT OFF (r4 measured, honest unaligned mixed-degree CSR:
        # G=4 16.5 ms vs G=1 12.2 ms at B=64K — when the need spread is
        # tight the whole batch already rides one single-shot level, and
        # 4 quarter-size pipelines pay ~1 ms/bucket of fixed kernel
        # overhead for nothing; scripts/exp_wsample2.py).  Flip
        # _WEIGHTED_BUCKETS to 4 for genuinely SKEWED degree
        # distributions, where isolating the heavy tail in its own
        # bucket keeps the other 3/4 off the ladder.
        G = (
            _WEIGHTED_BUCKETS
            if B % _WEIGHTED_BUCKETS == 0 and B >= 4096
            else 1
        )
        if G > 1:
            need = (start & 127) + deg
            order = jnp.argsort(need)
            Bg = B // G
            pos_parts, mask_parts = [], []
            for g in range(G):
                sl = order[g * Bg:(g + 1) * Bg]
                p, m = _weighted_block_ladder(
                    start[sl], deg[sl], K, seed, centers[sl], hop,
                    weights, max_degree,
                )
                pos_parts.append(p)
                mask_parts.append(m)
            pos = jnp.zeros((B, K), jnp.int32).at[order].set(
                jnp.concatenate(pos_parts)
            )
            mask = jnp.zeros((B, K), bool).at[order].set(
                jnp.concatenate(mask_parts)
            )
            return pos, mask
        return _weighted_block_ladder(
            start, deg, K, seed, centers, hop, weights, max_degree
        )
    total_chunks = max(-(-max_degree // chunk), 1)
    neg_inf = jnp.float32(-jnp.inf)

    def body(c, carry):
        best_keys, best_pos = carry
        offs = c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]  # [1, chunk]
        valid = offs < deg[:, None]
        eidx = start[:, None] + jnp.where(valid, offs, 0)
        w = _fetch(weights, eidx.reshape(-1)).reshape(B, chunk).astype(jnp.float32)
        u = rng.rand_uniform(
            seed, jnp.broadcast_to(centers[:, None], (B, chunk)), hop * _HOP_STRIDE + offs
        )
        # log(u)/w: u in [0,1) -> log<=0; larger key = more likely kept
        key = jnp.where(
            valid & (w > 0), jnp.log(jnp.maximum(u, 1e-20)) / w, neg_inf
        )
        return _merge_topk(
            best_keys, best_pos, key, K, lambda topi: c * chunk + (topi - K)
        )

    def run_level(nchunks):
        def branch(_):
            init = (
                jnp.full((B, K), neg_inf, jnp.float32),
                jnp.zeros((B, K), jnp.int32),
            )
            return lax.fori_loop(0, nchunks, body, init)

        return branch

    levels = []
    c = 1
    while c < total_chunks:
        levels.append(c)
        c *= 2
    levels.append(total_chunks)

    if len(levels) == 1:
        best_keys, best_pos = run_level(total_chunks)(None)
    else:
        needed = -(-jnp.max(deg) // chunk)  # chunks the batch actually needs
        idx = jnp.sum(needed > jnp.asarray(levels, jnp.int32)).astype(jnp.int32)
        best_keys, best_pos = lax.switch(
            jnp.clip(idx, 0, len(levels) - 1),
            [run_level(l) for l in levels],
            None,
        )

    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = (slots < jnp.minimum(deg, K)[:, None]) & (best_keys > neg_inf)
    return jnp.where(mask, best_pos, 0), mask


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def csr_sample_neighbors(
    row_ptr: TableLike,
    col: TableLike,
    centers: Array,
    max_sample: int,
    *,
    seed: int = 0,
    hop: int = 0,
    weights: Optional[TableLike] = None,
    max_degree: Optional[int] = None,
    gather_kwargs: Optional[dict] = None,
    cw_blocks: Optional[Array] = None,
) -> SampleResult:
    """Sample up to ``max_sample`` neighbors per center, without replacement.

    The analog of wholegraph_csr_{unweighted,weighted}_sample_without_replacement
    (reference: cpp/include/wholegraph/wholegraph_op.h:42-84).  ``row_ptr``/
    ``col``/``weights`` may be jnp arrays (replicated CSR) or ShardedTables
    (distributed CSR — fetches become distributed gathers, the NCCL-path
    analog).

    ``cw_blocks`` (optional, weighted replicated CSRs only): the
    precomputed :func:`interleave_col_weights` pair-block table — each
    block DMA then serves both the A-Res keys and the selected neighbor
    values, skipping the separate col fetch (bit-equal; build it once per
    graph via ``GraphStructure.with_weighted_fastpath()``).

    Returns a padded :class:`SampleResult`.
    """
    kw = gather_kwargs or {}
    K = int(max_sample)
    # edge offsets are int32: with jax x64 disabled, graphs beyond 2^31
    # edges need per-shard edge partitioning (each shard < 2^31)
    ecount = getattr(col, "n", None) or col.shape[0]
    if ecount >= 2**31:
        raise NotImplementedError(
            f"graph has {ecount} edges >= 2^31; shard the CSR so each shard's "
            "edge offsets fit in int32 (x64 is disabled)"
        )
    centers = centers.astype(jnp.int32)
    ptr_lo, ptr_hi = _fetch_ptr_pairs(row_ptr, centers, **kw)
    start = ptr_lo.astype(jnp.int32)
    deg = (ptr_hi - ptr_lo).astype(jnp.int32)

    if weights is None:
        pos, mask = _sample_positions_uniform(deg, K, seed, centers, hop)
    else:
        if max_degree is None:
            raise ValueError("weighted sampling requires static max_degree")
        if (
            cw_blocks is not None
            and not hasattr(weights, "gather")
            and not hasattr(col, "gather")
        ):
            pos, mask, nbrs = _weighted_sample_fused(
                start, deg, K, seed, centers, hop, cw_blocks,
                int(max_degree),
            )
            edge_ids = start[:, None] + pos
            return SampleResult(nbrs, mask, pos, edge_ids, deg)
        pos, mask = _sample_positions_weighted(
            start, deg, K, seed, centers, hop, weights, int(max_degree)
        )

    edge_ids = start[:, None] + pos
    nbrs = _fetch_cols(col, start, deg, pos, mask, max_degree, **kw)
    nbrs = jnp.where(mask, nbrs, -1)
    return SampleResult(nbrs, mask, pos, edge_ids, deg)


_NB_COL = 2  # 128-lane col blocks fetched per center per ladder iteration

import os as _os

# col-block lane select via the fused pallas kernel (select_lanes_pallas);
# 0 = the XLA broadcast-compare-reduce, kept for silicon A/Bs
_SELECT_PALLAS = int(_os.environ.get("WGTPU_SELECT_PALLAS", "1")) != 0

# col-window fetch as ONE slab DMA per center (gather_lane_slabs_pallas)
# instead of nb per-block ring rows; 0 = the r4 per-block fetch, for A/Bs
_SLAB_FETCH = int(_os.environ.get("WGTPU_SLAB_FETCH", "1")) != 0


def _select_lanes(lanes: Array, loc: Array, K: int) -> Array:
    """out[b, k] = lanes[b, loc[b, k]] (0 outside [0, S)): fused pallas
    kernel on TPU — the XLA broadcast-compare-reduce materialises the
    [B, K, S] one-hot in HBM (~1 GB at B=64K/K=15/S=256: the pre-r5
    dominant sampler cost, exp_uniform_ladder.py), and a span-wide
    take_along_axis costs ~15 ms at these shapes."""
    if _SELECT_PALLAS and jax.default_backend() == "tpu":
        from .gather_pallas import select_lanes_pallas

        return select_lanes_pallas(lanes, loc, K)
    oh = loc[:, :, None] == jnp.arange(
        lanes.shape[1], dtype=jnp.int32
    )[None, None, :]
    return jnp.sum(jnp.where(oh, lanes[:, None, :], 0), axis=2)


def _fetch_cols(col, start, deg, pos, mask, max_degree, **kw):
    """col[start[b] + pos[b, k]] for the sampled positions.

    Element path: one 128-lane block DMA per ELEMENT (B*K descriptors).
    Block path (TPU, replicated col, static max_degree): ONE slab DMA per
    center covering its enclosing blocks + the fused pallas lane select —
    a lax.switch picks the slab width {1, 2, 4} from the BATCH's span
    need, the block ladder + element path cover the long tail.  (A
    degree-bucketed variant — argsort into 4 span buckets so low buckets
    ride narrower selects — lived here through r3-r5 behind
    ``_COL_FETCH_BUCKETS``, measured negative: the argsort+scatter cost
    more than the narrower selects saved, and the r5 fused select made
    select width ~free.  Deleted; docs/DESIGN.md 'Uniform sampler
    ladder', implementation in git history.)"""
    return _fetch_cols_block(col, start, deg, pos, mask, max_degree, **kw)


def _fetch_cols_block(col, start, deg, pos, mask, max_degree, **kw):
    B, K = pos.shape
    edge_ids = start[:, None] + pos
    flat = jnp.where(mask, edge_ids, 0).reshape(-1)

    def element_path(_):
        return (
            _fetch_elements(col, flat, **kw)
            .reshape(B, K)
            .astype(jnp.int32)
        )

    use_blocks = (
        not hasattr(col, "gather")
        and jax.default_backend() == "tpu"
        and max_degree is not None
        and 0 < int(max_degree) < 2**24
        and B >= 256
    )
    if not use_blocks:
        return element_path(None)

    from .gather_pallas import (
        _gather_rows_pallas3_impl,
        gather_lane_slabs_pallas,
    )

    E = col.shape[0]
    pad_e = -E % 128
    c2 = col.astype(jnp.int32)
    if pad_e:
        c2 = jnp.concatenate([c2, jnp.zeros((pad_e,), jnp.int32)])
    c2 = c2.reshape(-1, 128)
    nblk_tab = c2.shape[0]
    span = _NB_COL * 128
    total_iters = max(-(-(127 + int(max_degree)) // span), 1)
    blk0 = start >> 7
    s_lane = start & 127
    eidx = s_lane[:, None] + jnp.where(mask, pos, 0)  # [B, K]

    def _select(lanes, loc):
        return _select_lanes(lanes, loc, K)

    def _fetch_window(blk_first, nb):
        """[B, nb*128] col lanes starting at block ``blk_first`` (clamped to
        the table) + the per-center lane shift the clamp introduced."""
        if _SLAB_FETCH and nblk_tab >= nb:
            blk_s = jnp.clip(blk_first, 0, nblk_tab - nb)
            return gather_lane_slabs_pallas(c2, blk_s, nb), (
                (blk_first - blk_s) * 128
            )
        bids = blk_first[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
        fl = jnp.clip(bids, 0, nblk_tab - 1).reshape(-1)
        pad_m = -fl.shape[0] % 1024
        if pad_m:
            fl = jnp.concatenate([fl, jnp.zeros((pad_m,), fl.dtype)])
        lanes = _gather_rows_pallas3_impl(c2, fl)[: B * nb].reshape(B, nb * 128)
        return lanes, jnp.zeros((B,), jnp.int32)

    def body(c, out):
        lanes, shift = _fetch_window(blk0 + c * _NB_COL, _NB_COL)
        loc = eidx - c * span  # [B, K]
        cover = (loc >= 0) & (loc < span)
        sel = _select(lanes, loc + shift[:, None])
        return jnp.where(cover, sel, out)

    needed = jnp.max(-(-(s_lane + jnp.maximum(deg, 1)) // span))

    def block_path(_):
        return _ladder_run(body, jnp.zeros((B, K), jnp.int32), total_iters, needed)

    def make_nb_path(nb):
        """Whole batch's spans inside each center's first ``nb`` enclosing
        blocks: nb DMA descriptors per center and a [B, K, nb*128] select.
        The r4 dispatch jumped from nb=1 straight to the 4-block ladder —
        honest mixed-degree batches (span <= 256 lanes) paid 4x descriptors
        AND a 4x-wide select for a 2-block need (r5 ladder calibration)."""

        def path(_):
            lanes, shift = _fetch_window(blk0, nb)
            return _select(lanes, eidx + shift[:, None])

        return path

    def general_path(_):
        return lax.cond(
            needed * _NB_COL <= K, block_path, element_path, None
        )

    span_need = jnp.max(s_lane + jnp.maximum(deg, 1))  # lanes from blk0
    sel_idx = (
        (span_need > 128).astype(jnp.int32)
        + (span_need > 256).astype(jnp.int32)
        + (span_need > 512).astype(jnp.int32)
    )
    return lax.switch(
        sel_idx,
        [make_nb_path(1), make_nb_path(2), make_nb_path(4), general_path],
        None,
    )

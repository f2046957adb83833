"""Sparse aggregation primitives: SpMM / SDDMM and padded-neighborhood reduce.

TPU-native replacement for the cuGraph-Ops fused aggregation kernels the
reference delegates message passing to (reference:
python torch/cugraphops/sage_conv.py:73-95 ``agg_concat_n2n`` fused
SpMM+concat, gat_conv.py ``mha_gat_n2n`` fused SDDMM+softmax+SpMM).

Two regimes, both XLA-friendly:

* **Padded regime** (sampled mini-batches): adjacency is ``[B, K]`` neighbor
  indices + mask.  Aggregation = dense gather + masked reduce over the static
  K axis — no scatter at all, fuses into the following matmul.  This is the
  hot path for GraphSAGE/GAT training and maps directly onto the VPU/MXU.
* **Edge-list regime** (full graph): COO edges sorted by destination;
  aggregation via ``jax.ops.segment_sum`` (sorted scatter-add).  Used for
  full-graph GCN/analysis passes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# Padded neighborhood reduce (sampled path)
# ---------------------------------------------------------------------------


def padded_gather_neighbors(x: Array, nbr_idx: Array) -> Array:
    """x: [U, D] node features; nbr_idx: [B, K] → [B, K, D].

    Routed through local_take so large batches use the Pallas DMA-ring
    gather on TPU (ops/gather_pallas.py) instead of XLA's serialized take."""
    from .gather import local_take

    B, K = nbr_idx.shape
    return local_take(x, nbr_idx.reshape(-1)).reshape(B, K, -1)


def padded_reduce(
    x: Array,
    nbr_idx: Array,
    mask: Array,
    reduce: str = "mean",
) -> Array:
    """Aggregate neighbor features over the padded K axis.

    x: [U, D], nbr_idx/mask: [B, K] → [B, D].
    """
    B, K = nbr_idx.shape
    if (
        reduce in ("sum", "mean")
        and jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.shape[1] % 128 == 0
        and B * K >= 4096
    ):
        # gather in the native [*, d0, 128] tile layout, reduce over K.
        # Measured on v5e: this UNFUSED form (96 Medges/s @ D=256) beats
        # every fused DMA-into-VMEM-accumulator variant (45/77/84 Medges/s,
        # ops/spmm_pallas.py + scripts/exp_spmm_diag.py): row fetches are
        # descriptor-bound (~8 ns HBM→HBM), so the extra HBM passes of the
        # unfused reduce are nearly free, while HBM→VMEM row DMAs plus
        # per-tile scalar↔vector synchronisation run slower per row.
        from .gather_pallas import gather_rows_pallas3

        D = x.shape[1]
        flat = jnp.clip(nbr_idx.reshape(-1).astype(jnp.int32), 0, x.shape[0] - 1)
        pad = -flat.shape[0] % 1024
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        neigh3 = gather_rows_pallas3(x, flat)[: B * K]
        neigh3 = neigh3.reshape(B, K, D // 128, 128)
        m3 = mask[:, :, None, None]
        s = jnp.sum(jnp.where(m3, neigh3, 0), axis=1)  # [B, d0, 128]
        if reduce == "mean":
            cnt = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(x.dtype)
            s = s / cnt[:, None, None]
        return s.reshape(B, D)

    neigh = padded_gather_neighbors(x, nbr_idx)  # [B, K, D]
    m = mask[..., None]
    if reduce == "sum":
        return jnp.sum(jnp.where(m, neigh, 0), axis=1)
    if reduce == "mean":
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1).astype(x.dtype)
        return jnp.sum(jnp.where(m, neigh, 0), axis=1) / cnt
    if reduce == "max":
        neg = jnp.asarray(-jnp.inf, x.dtype)
        out = jnp.max(jnp.where(m, neigh, neg), axis=1)
        return jnp.where(jnp.any(mask, axis=1, keepdims=True), out, 0)
    raise ValueError(f"unknown reduce {reduce!r}")


def padded_softmax(logits: Array, mask: Array, axis: int = 1) -> Array:
    """Masked softmax over the padded neighbor axis (GAT attention)."""
    neg = jnp.asarray(-1e30, logits.dtype)
    z = jnp.where(mask, logits, neg)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.where(mask, jnp.exp(z), 0)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-16)


# ---------------------------------------------------------------------------
# Windowed sampled-block aggregation (r5) — padded [B, K] blocks whose
# relabeled neighbor space inherits locality
# ---------------------------------------------------------------------------
#
# The padded gather+reduce above is DESCRIPTOR-bound (~8 ns/edge).  A sampled
# block relabeled by append_unique has unique_ids = [targets | new ids SORTED
# ASCENDING] — a concat of ascending RUNS (one per hop level).  On a
# locality-ordered graph, a tile of consecutive destinations has neighbors
# with nearby NODE ids, hence nearby ranks within each run: the relabeled
# cols are windowable PER RUN (measured r5: 96.6% of hop-1 edges inside
# per-run 4096-row windows at B=1024 fanouts 10/15 on a width-192 clustered
# graph, vs 8% for one global window — the runs sit far apart).  So the
# aggregation becomes one spmm_window pass per run (mask-weights select the
# run's in-window edges; per-row fillers keep foreign cols from poisoning
# the kernel's per-tile window origin) + an EXACT EDGE-level residual: the
# few out-of-window edges are compacted to a static cap and added through a
# per-edge gather+scatter (row-level recompute would amplify a 3% edge miss
# to ~40% of rows at K=15), with a lax.cond falling back to the full padded
# path when the residual overflows.  Reference analog: the same fused
# CSC-tile aggregation (sage_conv.py:84-95) the full-graph windowed kernel
# replaces; this extends it to the TRAINING (sampled) path.


def padded_reduce_windowed(
    x: Array,
    nbr_idx: Array,
    mask: Array,
    reduce: str = "sum",
    *,
    run_bounds,
    windows,
    tile: int = 256,
    residual_cap_frac: float = 0.25,
) -> Array:
    """Sampled-block aggregation through the windowed MXU kernel.

    x: [U, D] gathered unique rows; nbr_idx/mask: [B, K] padded adjacency
    (cols index into x).  ``run_bounds``: static ascending tuple of
    unique-list run boundaries ``(0, T, U1, ..., U)`` — append_unique's
    [targets | sorted-new] concat structure (see
    ``MultilayerSample.run_bounds``).  ``windows``: static per-run window
    row counts (int or tuple, multiples of 128 recommended).
    ``residual_cap_frac``: static cap on out-of-window edges (fraction of
    B*K) before the whole block falls back to the padded path.  EXACT for
    any block.  Differentiable w.r.t. ``x``."""
    from ..utils.error import check_input

    check_input(reduce in ("sum", "mean"), f"unknown reduce {reduce!r}")
    B, K = nbr_idx.shape
    U, D = x.shape
    check_input(D % 128 == 0, "dim must be a multiple of 128")
    rb = tuple(int(b) for b in run_bounds)
    check_input(
        rb[0] == 0 and all(a < b for a, b in zip(rb, rb[1:])) and rb[-1] <= U,
        f"bad run_bounds {rb} for U={U}",
    )
    nruns = len(rb) - 1
    if isinstance(windows, int):
        windows = (windows,) * nruns
    windows = tuple(int(w) for w in windows)
    check_input(len(windows) == nruns, "windows must match run count")

    from .spmm_pallas import spmm_window

    cols = jnp.clip(
        jnp.where(mask, nbr_idx, 0).astype(jnp.int32), 0, U - 1
    )
    row_ptr = (jnp.arange(B + 1, dtype=jnp.int32) * K)
    nt = -(-B // tile)
    tile_of_row = jnp.arange(B, dtype=jnp.int32) // tile
    BIG = jnp.int32(2**30)

    # per-(tile, run) window origins + in-window flags (conservative: the
    # kernel's own origin is the min col rounded DOWN, so col - w0 < window
    # implies in-kernel-window; flagged-out-but-in edges just join the
    # residual, never the reverse)
    inw_any = jnp.zeros((B, K), bool)
    run_data = []
    for r in range(nruns):
        lo, hi = rb[r], rb[r + 1]
        in_run = mask & (cols >= lo) & (cols < hi)
        crun = jnp.where(in_run, cols, BIG)
        w0_tile = jax.ops.segment_min(
            jnp.min(crun, axis=1), tile_of_row, num_segments=nt,
            indices_are_sorted=True,
        )  # [nt], BIG where the tile has no run-r edge
        w0_row = jnp.where(w0_tile < BIG, w0_tile, hi - 1)[tile_of_row]
        inw = in_run & (cols - w0_row[:, None] < windows[r])
        inw_any |= inw
        # per-row filler for foreign cols: the row's own min run-r col (or
        # hi-1) keeps the kernel's per-tile min at the true run minimum
        row_min = jnp.min(crun, axis=1)
        filler = jnp.where(row_min < BIG, row_min, hi - 1)
        run_data.append((inw, filler))

    out = jnp.zeros((B, D), jnp.float32)
    for r in range(nruns):
        inw, filler = run_data[r]
        col_pass = jnp.where(inw, cols, filler[:, None])
        out = out + spmm_window(
            row_ptr, col_pass.reshape(-1), x,
            window=windows[r], edge_cap=tile * K, tile=tile, reduce="sum",
            edge_weight=inw.astype(jnp.float32).reshape(-1),
            weight_grad=False,
            # 0/1 mask weights are bf16-representable: the single-pass
            # bf16 A-build is EXACT here and ~6x cheaper than HIGHEST
            weight_precision="bf16",
        )

    # exact EDGE-level residual: compact out-of-window edges to a static
    # cap, add each through a gather + scatter-add; overflow -> full padded
    # fallback (exactness never depends on the locality assumption)
    res_e = (mask & ~inw_any).reshape(-1)
    R_cap = max(1024, int(B * K * residual_cap_frac))
    n_res = jnp.sum(res_e)

    def residual_path(out):
        pos = jnp.cumsum(res_e.astype(jnp.int32)) - 1
        idxs = jnp.where(res_e, pos, R_cap)
        col_list = (
            jnp.zeros((R_cap,), jnp.int32)
            .at[idxs].set(cols.reshape(-1), mode="drop")
        )
        dst_list = (
            jnp.full((R_cap,), B, jnp.int32)
            .at[idxs].set(
                (jnp.arange(B * K, dtype=jnp.int32) // K), mode="drop"
            )
        )
        contrib = jnp.take(x.astype(jnp.float32), col_list, axis=0,
                           mode="clip")
        contrib = jnp.where((dst_list < B)[:, None], contrib, 0.0)
        return out.at[dst_list].add(contrib, mode="drop")

    def full_fallback(out):
        return padded_reduce(
            x.astype(jnp.float32), nbr_idx, mask, "sum"
        )

    out = lax.cond(n_res > R_cap, full_fallback, residual_path, out)
    if reduce == "mean":
        cnt = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(jnp.float32)
        out = out / cnt[:, None]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Edge-list (COO) regime — full graph
# ---------------------------------------------------------------------------


def spmm(
    edge_src: Array,
    edge_dst: Array,
    x: Array,
    num_dst: int,
    reduce: str = "sum",
    edge_weight: Optional[Array] = None,
    indices_are_sorted: bool = True,
) -> Array:
    """out[d] = reduce_{(s,d) in E} (w_e *) x[s]  — the SpMM.

    Edges should be sorted by ``edge_dst`` for TPU efficiency.
    """
    msgs = jnp.take(x, edge_src, axis=0, mode="clip")
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    if reduce in ("sum", "mean"):
        out = jax.ops.segment_sum(
            msgs, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
        )
        if reduce == "mean":
            cnt = jax.ops.segment_sum(
                jnp.ones((edge_src.shape[0],), x.dtype),
                edge_dst,
                num_segments=num_dst,
                indices_are_sorted=indices_are_sorted,
            )
            out = out / jnp.maximum(cnt, 1)[:, None]
        return out
    if reduce == "max":
        return jax.ops.segment_max(
            msgs, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
        )
    raise ValueError(f"unknown reduce {reduce!r}")


def sddmm(edge_src: Array, edge_dst: Array, a: Array, b: Array) -> Array:
    """e_{(s,d)} = <a[d], b[s]> per edge — the SDDMM.

    Materializes two ``[E, D]`` gathered intermediates — fine for sampled
    edge lists; full-graph edge counts need :func:`sddmm_chunked` (at
    E=25M/D=256 the intermediates are 2 x 26 GB and the compile OOMs a
    16 GB chip — measured r4)."""
    return jnp.sum(
        jnp.take(a, edge_dst, axis=0, mode="clip")
        * jnp.take(b, edge_src, axis=0, mode="clip"),
        axis=-1,
    )


def sddmm_chunked(
    edge_src: Array, edge_dst: Array, a: Array, b: Array,
    *, chunk: int = 1 << 20,
) -> Array:
    """:func:`sddmm` in O(chunk x D) memory: a lax.map over edge chunks
    (the full-graph production path; XLA pipelines the chunked takes)."""
    E = edge_src.shape[0]
    pad = -E % chunk
    src = jnp.concatenate([edge_src, jnp.zeros((pad,), edge_src.dtype)])
    dst = jnp.concatenate([edge_dst, jnp.zeros((pad,), edge_dst.dtype)])
    nchunks = src.shape[0] // chunk

    def one(args):
        s, d = args
        return sddmm(s, d, a, b)

    e = jax.lax.map(
        one, (src.reshape(nchunks, chunk), dst.reshape(nchunks, chunk))
    )
    return e.reshape(-1)[:E]


def edge_softmax(
    edge_dst: Array, logits: Array, num_dst: int, indices_are_sorted: bool = True
) -> Array:
    """Per-destination softmax over edge logits (GAT full-graph)."""
    mx = jax.ops.segment_max(
        logits, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
    )
    z = logits - jax.lax.stop_gradient(jnp.take(mx, edge_dst, mode="clip"))
    e = jnp.exp(z)
    s = jax.ops.segment_sum(
        e, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
    )
    return e / jnp.maximum(jnp.take(s, edge_dst, mode="clip"), 1e-16)


# ---------------------------------------------------------------------------
# Dense-tile MXU SpMM — locality-ordered (clustered) graphs
# ---------------------------------------------------------------------------
#
# The padded gather+reduce above is DESCRIPTOR-bound: every edge moves one
# row through an independent ~8 ns DMA, capping any random-edge SpMM at
# ~125 Medges/s on v5e regardless of dtype or fusion (measured ladder in
# docs/DESIGN.md; every fused VMEM-accumulator variant measured slower).
# When the graph is LOCALITY-ORDERED (METIS/RCM/community-clustered vertex
# ids — the standard production layout for full-graph passes), a tile of
# consecutive destinations references a narrow source window, and the whole
# aggregation becomes two small matmuls per tile on the MXU:
#
#   A[t]  = onehot_dst^T @ diag(w) @ onehot_src      [T, W] adjacency tile
#   out_t = A[t] @ x[w0 : w0+W]                      window slab, contiguous
#
# Both one-hots are iota compares (VPU) and both matmuls run on the MXU, so
# per-edge cost is amortized compare+multiply lanes instead of a DMA
# descriptor: for T=512, W=1024, avg deg 16 that is ~500x more arithmetic
# lanes per edge than the MXU has to spare vs the 8 ns descriptor floor.
# Exactness: counts/weights accumulate in f32 via preferred_element_type;
# summation order differs from segment_sum (tolerance tests).
#
# Reference analog: cuGraph-Ops' CSR-tile agg kernels (sage_conv.py:73-95
# delegate); the reference also only wins when locality exists.


def plan_spmm_tiles(row_ptr, col, tile: int = 512):
    """Host-side plan: (window, edge_cap, feasible) for :func:`spmm_tiled`.

    window = max source span of any destination tile (rounded up to 128),
    edge_cap = max edges in any tile.  feasible=False when the graph has no
    usable locality (window ~ num_src) — callers should then use
    :func:`spmm` / :func:`padded_reduce`."""
    import numpy as np

    rp = np.asarray(row_ptr)
    c = np.asarray(col)
    n = rp.shape[0] - 1
    nt = -(-n // tile)
    window = 128
    edge_cap = 1
    for t in range(nt):
        e0, e1 = rp[min(t * tile, n)], rp[min((t + 1) * tile, n)]
        edge_cap = max(edge_cap, int(e1 - e0))
        if e1 > e0:
            span = int(c[e0:e1].max()) - int(c[e0:e1].min()) + 1
            window = max(window, span)
    window = -(-window // 128) * 128
    edge_cap = -(-edge_cap // 128) * 128
    n_src = int(c.max()) + 1 if len(c) else 1
    feasible = window <= max(2048, n_src // 4)
    return window, edge_cap, feasible


def spmm_tiled(
    row_ptr: Array,
    col: Array,
    x: Array,
    *,
    window: int,
    edge_cap: int,
    tile: int = 512,
    reduce: str = "sum",
    edge_weight: Optional[Array] = None,
) -> Array:
    """MXU dense-tile SpMM over a locality-ordered CSR (see block comment).

    out[d] = reduce_{e in row d} (w_e *) x[col[e]].  EXACT for any graph:
    a lax.cond falls back to the segment-sum :func:`spmm` whenever some
    tile's source span exceeds ``window`` or its edge count exceeds
    ``edge_cap`` (use :func:`plan_spmm_tiles` to size both).
    """
    n = row_ptr.shape[0] - 1
    E = col.shape[0]
    D = x.shape[1]
    T = tile
    nt = -(-n // T)
    n_pad = nt * T
    rp = jnp.concatenate(
        [row_ptr.astype(jnp.int32),
         jnp.full((n_pad - n,), row_ptr[-1], jnp.int32)]
    ) if n_pad != n else row_ptr.astype(jnp.int32)
    colp = jnp.concatenate([col.astype(jnp.int32), jnp.zeros((edge_cap,), jnp.int32)])
    wp = None
    if edge_weight is not None:
        wp = jnp.concatenate(
            [edge_weight.astype(jnp.float32), jnp.zeros((edge_cap,), jnp.float32)]
        )
    xp = jnp.concatenate(
        [x, jnp.zeros((window, D), x.dtype)]
    )  # slab reads never clip

    # per-tile edge ranges; edge_cap feasibility is checkable from rp alone,
    # window feasibility falls out of the tile pass itself (out-of-window
    # edges are counted as `dropped` and trigger the exact fallback)
    starts = rp[jnp.arange(nt) * T]
    ends = rp[jnp.minimum(jnp.arange(nt) * T + T, n_pad)]
    counts = ends - starts
    ok_cap = jnp.max(counts) <= edge_cap

    def tiles_path(_):
        iot_e = jnp.arange(edge_cap, dtype=jnp.int32)

        def body(dropped, t):
            e0, ne = starts[t], counts[t]
            emask = iot_e < ne
            cols = lax.dynamic_slice(colp, (e0,), (edge_cap,))
            w0 = jnp.clip(
                jnp.min(jnp.where(emask, cols, 2**30)), 0, x.shape[0]
            )
            loc = jnp.where(emask, cols - w0, -1)
            in_win = emask & (loc >= 0) & (loc < window)
            dropped = dropped + ne - jnp.sum(in_win)
            # dst row of each edge within the tile: CSR order => edge j
            # belongs to the row whose ptr range contains e0 + j
            rpt = lax.dynamic_slice(rp, (t * T,), (T + 1,)) - e0
            dstl = (
                jnp.searchsorted(rpt, iot_e, side="right").astype(jnp.int32) - 1
            )
            dstl = jnp.where(in_win, dstl, T)  # park dropped edges off-tile
            vals = jnp.ones((edge_cap,), jnp.float32)
            if wp is not None:
                vals = lax.dynamic_slice(wp, (e0,), (edge_cap,))
            vals = jnp.where(in_win, vals, 0.0)
            # one-hots on iota compares; both contractions ride the MXU
            oh_dst = (
                dstl[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32)  # [E, T]
            oh_src = (
                loc[:, None] == jnp.arange(window, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32)  # [E, W]
            A = lax.dot_general(
                oh_dst * vals[:, None], oh_src,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, W]
            xw = lax.dynamic_slice(xp, (w0, 0), (window, D)).astype(jnp.float32)
            out_t = lax.dot_general(
                A, xw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if reduce == "mean":
                # unweighted edge counts per dst (matches spmm's mean)
                cnt = jax.ops.segment_sum(
                    in_win.astype(jnp.float32), jnp.minimum(dstl, T),
                    num_segments=T + 1, indices_are_sorted=True,
                )[:T]
                out_t = out_t / jnp.maximum(cnt, 1.0)[:, None]
            return dropped, out_t.astype(x.dtype)

        dropped, outs = lax.scan(body, jnp.int32(0), jnp.arange(nt))
        out = outs.reshape(n_pad, D)[:n]
        # any out-of-window edge => the plan was wrong for this graph:
        # recompute exactly (pays both passes, but only on a bad plan)
        return lax.cond(dropped == 0, lambda _: out, fallback, None)

    def fallback(_):
        edge_dst = (
            jnp.searchsorted(
                rp, jnp.arange(E, dtype=jnp.int32), side="right"
            ).astype(jnp.int32)
            - 1
        )
        return spmm(
            col.astype(jnp.int32), edge_dst, x, n, reduce,
            edge_weight=edge_weight, indices_are_sorted=True,
        )

    if reduce not in ("sum", "mean"):
        return fallback(None)
    return lax.cond(ok_cap, tiles_path, fallback, None)


# ---------------------------------------------------------------------------
# Distributed (pod-scale) full-graph SpMM / SDDMM
# ---------------------------------------------------------------------------


def spmm_sharded(
    edge_src: Array,
    edge_dst: Array,
    x,  # ShardedTable
    num_dst: int,
    reduce: str = "sum",
    edge_weight: Optional[Array] = None,
    *,
    capacity_factor: float = 2.0,
):
    """Distributed full-graph SpMM: features AND output row-sharded across
    the mesh, edges partitioned across devices.

    out[d] = reduce_{(s,d) in E} (w_e *) x[s], where ``x`` is a
    :class:`ShardedTable` (the pod-wide feature store) and
    ``edge_src``/``edge_dst`` hold each device's edge range (global node
    ids, sharded P(axis)).  Composition of the EXACT primitives: a
    multi-round a2a gather fetches the source rows, and a multi-round
    accumulate-scatter sums every contribution into the destination-owner
    shards — no edge, however skewed, is dropped.  This is the pod-scale
    eval path for graphs whose features exceed one chip's HBM (papers100M
    at dim 128 = 57 GB); the reference covers this case with its
    multi-GPU gather + cuGraph-Ops per-rank aggregation.

    Returns a ShardedTable of shape [num_dst, D] on x's mesh/axis.
    """
    from ..memory.sharded_table import ShardedTable
    from ..utils.error import check_input

    check_input(reduce in ("sum", "mean"), f"unknown reduce {reduce!r}")
    msgs = x.gather(edge_src, capacity_factor=capacity_factor)
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    out = ShardedTable.create(x.mesh, num_dst, msgs.shape[1], msgs.dtype,
                              axis=x.axis)
    from .gather import scatter as _dist_scatter

    data = _dist_scatter(
        out.data, edge_dst, msgs, plan=out.plan, mesh=x.mesh, axis=x.axis,
        accumulate=True, capacity_factor=capacity_factor, donate=True,
    )
    if reduce == "mean":
        cnt = ShardedTable.create(x.mesh, num_dst, 1, msgs.dtype, axis=x.axis)
        ones = jnp.ones((edge_dst.shape[0], 1), msgs.dtype)
        cdata = _dist_scatter(
            cnt.data, edge_dst, ones, plan=cnt.plan, mesh=x.mesh, axis=x.axis,
            accumulate=True, capacity_factor=capacity_factor, donate=True,
        )
        data = data / jnp.maximum(cdata, 1)
    return ShardedTable(data, out.plan, x.mesh, x.axis)


def sddmm_sharded(
    edge_src: Array,
    edge_dst: Array,
    a,  # ShardedTable
    b,  # ShardedTable
    *,
    capacity_factor: float = 2.0,
) -> Array:
    """Distributed SDDMM: e = <a[dst], b[src]> per edge with both operand
    tables row-sharded; returns per-edge scores sharded like the edges."""
    va = a.gather(edge_dst, capacity_factor=capacity_factor)
    vb = b.gather(edge_src, capacity_factor=capacity_factor)
    return jnp.sum(va * vb, axis=-1)

"""Fused padded-neighborhood aggregation kernel (SpMM v2).

TPU-native replacement for cuGraph-Ops' fused neighborhood aggregation
(reference: torch/cugraphops/sage_conv.py:73-95 ``agg_concat_n2n``).  The
unfused path (ops/spmm.py gather → HBM → masked K-reduce) moves every
neighbor row through HBM three times (gather write, reduce read, plus the
original read); this kernel reads each row from HBM exactly ONCE:

  per center-block of C centers (grid step):
    software-pipelined DMA ring fetches 8-row tiles (the k-th neighbor of 8
    consecutive centers → one [8, D] VMEM tile = full sublanes for the VPU
    accumulate) and accumulates ``out[8 rows] += tile`` in VMEM.

Masked slots skip their DMA entirely (their tile row is zero-filled
instead), so HBM traffic is proportional to REAL edges, not the padded B*K.

Ceiling math (v5e, measured in scripts/exp_gather_desc*.py): row fetches
are DMA-descriptor-bound at ~8 ns/row regardless of semaphore strategy,
ring depth, or priority queues, so at D=256 fp32 the kernel's ceiling is
~125 M edges/s (1 KB/edge · 8 ns) — the fusion removes the 2 extra HBM
passes vs gather+reduce, and only multi-row descriptors could go further.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# one-dot-per-group A-build for the windowed SpMM (r5b, DESIGN.md
# 'Windowed-kernel acc traffic'); env-overridable for silicon A/Bs
_GROUP_DOT = int(_os.environ.get("WGTPU_SPMM_GROUP_DOT", "0")) != 0


def _fused_agg_kernel(
    ids_ref,  # SMEM [C, K] int32; masked slots point at the appended ZERO row
    x_ref,  # ANY  [N+1, d0, 128] (last row is all-zero)
    out_ref,  # VMEM [C, d0, 128] f32 accumulator (block output)
    bufs,  # VMEM scratch [2, K, 8, d0, 128] (double-buffered sub-groups)
    sems,  # DMA sems [2, K, 8]
    *,
    C: int,
    K: int,
):
    # Tuned by measurement (v5e): every DMA is UNCONDITIONAL — masked slots
    # fetch the zero row (per-row pl.when guards cost ~15 ns/row of scalar
    # branching: 45 Medges/s) — and the accumulate is ONE K-axis reduction
    # per 8-center sub-group instead of one add per tile (per-tile vector
    # statements cost ~4 ns/row of scalar-vector sync: 84 Medges/s).
    G = C // 8  # 8-center sub-groups per block

    def row_dma(s, k, r):
        idx = ids_ref[s * 8 + r, k]
        return pltpu.make_async_copy(
            x_ref.at[idx], bufs.at[s % 2, k, r], sems.at[s % 2, k, r]
        )

    def issue(s):
        for k in range(K):
            for r in range(8):
                row_dma(s, k, r).start()

    def wait_reduce(s):
        for k in range(K):
            for r in range(8):
                row_dma(s, k, r).wait()
        # [K, 8, d0, 128] -> [8, d0, 128]: a single traced reduction
        out_ref[s * 8 : (s + 1) * 8] = jnp.sum(bufs[s % 2], axis=0)

    issue(0)
    if G > 1:
        issue(1)
    for s in range(G):
        wait_reduce(s)
        if s + 2 < G:
            issue(s + 2)


@functools.partial(jax.jit, static_argnames=("block_c", "ring"))
def _fused_padded_sum_impl(
    x: Array, ids: Array, *, block_c: int = 64, ring: int = 32
) -> Array:
    """sum_k x[ids[b,k]] → [B, D] f32.  ``x`` must carry an all-zero LAST
    row; masked slots point at it.  B must be a multiple of block_c; D a
    multiple of 128."""
    B, K = ids.shape
    N1, D = x.shape
    assert D % 128 == 0 and B % block_c == 0 and block_c % 8 == 0
    d0 = D // 128
    del ring
    out3 = pl.pallas_call(
        functools.partial(_fused_agg_kernel, C=block_c, K=K),
        grid=(B // block_c,),
        in_specs=[
            pl.BlockSpec((block_c, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_c, d0, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, d0, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, 8, d0, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, K, 8)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.astype(jnp.int32), x.reshape(N1, d0, 128))
    return out3.reshape(B, D)


def _fused_sum_fwd_padded(x, nbr_idx, mask):
    """Append the zero row, route masked slots to it, pad B, run the kernel."""
    B, K = nbr_idx.shape
    N, D = x.shape
    block_c = 64
    xz = jnp.concatenate([x.astype(jnp.float32), jnp.zeros((1, D), jnp.float32)])
    ids = jnp.where(mask, jnp.clip(nbr_idx.astype(jnp.int32), 0, N - 1), N)
    pad = -B % block_c
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad, K), N, jnp.int32)])
    out = _fused_padded_sum_impl(xz, ids, block_c=block_c)
    return out[:B].astype(x.dtype) if pad else out.astype(x.dtype)


@jax.custom_vjp
def fused_padded_sum(x: Array, nbr_idx: Array, mask: Array) -> Array:
    """Fused masked neighborhood SUM: out[b] = Σ_k mask[b,k]·x[nbr_idx[b,k]].

    Single-HBM-pass pallas kernel on TPU (see module docstring); the VJP is
    the scatter-add of the output cotangent over the edges — identical math
    to the unfused path's autodiff."""
    return _fused_sum_fwd_padded(x, nbr_idx, mask)


def _fps_fwd(x, nbr_idx, mask):
    # NB: residuals must be JAX types (no dtype objects) — the out/ct dtype
    # equals x's dtype (fwd casts), so the bwd derives it from ct.
    return _fused_sum_fwd_padded(x, nbr_idx, mask), (x.shape, nbr_idx, mask)


def _fps_bwd(res, ct):
    (N, D), nbr_idx, mask = res
    dtype = ct.dtype
    B, K = nbr_idx.shape
    flat = jnp.where(mask, nbr_idx, N).reshape(-1)
    ct_edges = jnp.broadcast_to(ct[:, None, :], (B, K, D)).reshape(B * K, D)
    dx = (
        jnp.zeros((N, D), jnp.float32)
        .at[flat]
        .add(jnp.where(mask.reshape(-1, 1), ct_edges, 0), mode="drop")
        .astype(dtype)
    )
    return dx, None, None


fused_padded_sum.defvjp(_fps_fwd, _fps_bwd)


# ---------------------------------------------------------------------------
# Windowed dense-tile SpMM (clustered / locality-ordered CSR) — round 4
# ---------------------------------------------------------------------------
#
# The XLA spmm_tiled (ops/spmm.py) proved the MXU formulation (adjacency tile
# A = one-hot build, out_tile = A @ window) but measured 14.9 Medges/s: XLA
# materializes the [E_cap, T] / [E_cap, W] one-hots to HBM.  Here both
# one-hots live entirely in VREGs/VMEM:
#
#   per destination tile t (grid step):
#     DMA the source window slab x[w0_t : w0_t+W] into VMEM   (multi-row DMA)
#     DMA the tile's col/weight edge blocks ([capb, 128])     (CSR is dst-
#        sorted, so a tile's edges are CONTIGUOUS — block cover like the
#        samplers' col fetch)
#     for each 1024-edge group (dynamic trip count = the tile's real edges):
#       transpose [8, 128] col tile -> [128, 8]; per 128-edge sub-block:
#         oh_dst [128, T] = rpt_lo/hi lane compares   (dst ids NEVER touch
#            memory: CSR row offsets give them as two broadcast compares)
#         oh_src [128, W] = col-value lane compare
#         A += oh_dst^T(int8) @ oh_src(int8) -> int32   (s8 MXU, exact counts)
#     out_tile = A(f32) @ window  [T, W] @ [W, D]
#
# Cost/edge (T=256, W=512): A-build 2*T*W = 262K s8 ops (~0.7 ns at peak),
# one-hot compares ~1.5K VPU ops, A@win amortized 2*T*W*D/E_t, window fetch
# W*D*4/E_t bytes.  No per-edge DMA descriptor anywhere — this clears the
# ~8 ns/edge descriptor floor that caps every random-access SpMM variant
# (docs/DESIGN.md negative records).
#
# Weighted edges ride the same structure with an f32 A accumulation (the
# weight multiplies oh_dst before the contraction).  Reference analog:
# cuGraph-Ops CSR-tile agg kernels (sage_conv.py:73-95 delegate).


def _transpose8(blk):  # [8, 128] -> [128, 8]
    return jnp.transpose(blk, (1, 0))


def _spmm_window_kernel(
    w0s_ref, blk0s_ref, off0s_ref, ne_ref, rlo_ref, rhi_ref,
    col2_ref, w2_ref, x_ref, out_ref,
    win, colbuf, wbuf, acc, *rest,
    T, W, D, capb, nt, weighted, reduce, wprec="highest",
    group_dot=False,
):
    if group_dot:
        ohd_buf, ohs_buf, sems, csems = rest
    else:
        sems, csems = rest
    t = pl.program_id(0)

    def wcopy(slot, tt):
        w0 = pl.multiple_of(w0s_ref[tt], 32)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(w0, W), :], win.at[slot], sems.at[slot]
        )

    def ccopy(slot, tt):
        b0 = pl.multiple_of(blk0s_ref[tt], 8)
        return pltpu.make_async_copy(
            col2_ref.at[pl.ds(b0, capb), :], colbuf.at[slot], csems.at[slot, 0]
        )

    def wtcopy(slot, tt):
        b0 = pl.multiple_of(blk0s_ref[tt], 8)
        return pltpu.make_async_copy(
            w2_ref.at[pl.ds(b0, capb), :], wbuf.at[slot], csems.at[slot, 1]
        )

    def start_all(slot, tt):
        wcopy(slot, tt).start()
        ccopy(slot, tt).start()
        if weighted:
            wtcopy(slot, tt).start()

    @pl.when(t == 0)
    def _first():
        start_all(0, 0)

    @pl.when(t + 1 < nt)
    def _pref():
        start_all((t + 1) % 2, t + 1)

    slot = t % 2
    wcopy(slot, t).wait()
    ccopy(slot, t).wait()
    if weighted:
        wtcopy(slot, t).wait()

    off0 = off0s_ref[t]
    ne = ne_ref[t]
    w0 = w0s_ref[t]
    # rlo/rhi arrive as (8, T) blocks (Mosaic requires sublane counts
    # divisible by 8 — a (1, T) block fails lowering ON TPU ONLY); the
    # tile's row is the t%8 sublane.  Select it with a one-hot masked sum
    # (the same vectorized trick the col extraction uses below) — a dynamic
    # sublane slice `ref[pl.ds(t % 8, 1), :]` compiles on TPU but returned
    # WRONG rows in the r4 hardware sweep (validate_r4b).
    sub_sel = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0) == (t % 8)
    rlo_row = jnp.sum(jnp.where(sub_sel, rlo_ref[...], 0), axis=0,
                      keepdims=True).reshape(1, T)  # [1, T]
    rhi_row = jnp.sum(jnp.where(sub_sel, rhi_ref[...], 0), axis=0,
                      keepdims=True).reshape(1, T)
    acc_dtype = jnp.float32 if weighted else jnp.int32
    acc[...] = jnp.zeros((T, W), acc_dtype)

    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    lane_W = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1)
    ng = (off0 + ne + 1023) // 1024
    # the 8 sub-blocks fully unrolled keep 8 live [128, W] one-hots — at
    # W >= ~2048 that blows the 16 MB scoped-VMEM limit (measured 17.82 MB
    # at W=2176, artifacts/r5_batch5.log); large windows run the sub-block
    # loop sequentially instead
    unroll_j = 8 if W <= 1024 else 1

    def group(g, _):
        cT = _transpose8(colbuf[slot, pl.ds(g * 8, 8), :])  # [128, 8]
        if weighted:
            vT = _transpose8(wbuf[slot, pl.ds(g * 8, 8), :])

        def sub_stage(j, _c):
            # group_dot: stage each sub-block's one-hot rows into the
            # [1024, .] group buffers — ONE dot per group replaces 8
            # per-sub-block dots + 8 acc[T, W] read-modify-writes (the
            # kernel's measured bottleneck, DESIGN.md 'Windowed-kernel
            # acc traffic')
            onehot_j = iota8 == j
            colv = jnp.sum(jnp.where(onehot_j, cT, 0), axis=1, keepdims=True)
            pl_sub = g * 1024 + j * 128 + iota_sub - off0
            valid = (pl_sub >= 0) & (pl_sub < ne)
            oh_src = ((colv - w0 == lane_W) & valid).astype(jnp.int8)
            oh_dst = (pl_sub >= rlo_row) & (pl_sub < rhi_row) & valid
            base = j * 128
            if not weighted:
                ohd_buf[pl.ds(base, 128), :] = oh_dst.astype(jnp.int8)
                ohs_buf[pl.ds(base, 128), :] = oh_src
            else:
                wv = jnp.sum(
                    jnp.where(onehot_j, vT, 0), axis=1, keepdims=True
                )
                ohd_f = oh_dst.astype(jnp.float32)
                ohs_buf[pl.ds(base, 128), :] = oh_src.astype(jnp.bfloat16)
                if wprec == "bf16":
                    ohd_buf[0, pl.ds(base, 128), :] = (
                        ohd_f * wv
                    ).astype(jnp.bfloat16)
                else:  # split2
                    w_hi = wv.astype(jnp.bfloat16)
                    w_lo = (wv - w_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    ohd_buf[0, pl.ds(base, 128), :] = (
                        ohd_f * w_hi.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    ohd_buf[1, pl.ds(base, 128), :] = (
                        ohd_f * w_lo.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
            return 0

        def sub(j, _c):
            onehot_j = iota8 == j
            colv = jnp.sum(jnp.where(onehot_j, cT, 0), axis=1, keepdims=True)
            pl_sub = g * 1024 + j * 128 + iota_sub - off0  # local edge pos
            valid = (pl_sub >= 0) & (pl_sub < ne)
            oh_src = ((colv - w0 == lane_W) & valid).astype(jnp.int8)
            oh_dst = (pl_sub >= rlo_row) & (pl_sub < rhi_row) & valid
            if weighted:
                wv = jnp.sum(
                    jnp.where(onehot_j, vT, 0), axis=1, keepdims=True
                )
                if wprec == "bf16":
                    # ONE bf16 pass: EXACT when every weight is bf16-
                    # representable (the mask-derived 0/1 weights of
                    # padded_reduce_windowed)
                    lhs = (
                        oh_dst.astype(jnp.float32) * wv
                    ).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        lhs, oh_src.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                elif wprec == "split2":
                    # 2 bf16 single-pass dots: w = hi + lo (bf16 planes,
                    # ~2^-16 rel).  Each term is EXACT per pass (one-hot
                    # 1.0 x bf16 plane multiplies exactly into the f32
                    # accumulator); vs HIGHEST's ~6 bf16 passes this is
                    # the weighted A-build at ~1/3 the MXU cost — for
                    # gradient-grade weights (GAT attention).
                    ohs_b = oh_src.astype(jnp.bfloat16)
                    ohd_f = oh_dst.astype(jnp.float32)
                    w_hi = wv.astype(jnp.bfloat16)
                    w_lo = (wv - w_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    contrib = jnp.zeros((T, W), jnp.float32)
                    for wp in (w_hi, w_lo):
                        lhs = (ohd_f * wp.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        contrib = contrib + jax.lax.dot_general(
                            lhs, ohs_b, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                else:
                    lhs = oh_dst.astype(jnp.float32) * wv
                    # HIGHEST: TPU's default f32 dot is a single bf16 MXU
                    # pass (~1e-2 relative — the r4 hardware sweep failed
                    # on exactly this); oh_src is 0/1 (bf16-exact), lhs
                    # carries the weights.
                    contrib = jax.lax.dot_general(
                        lhs, oh_src.astype(jnp.float32),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
            else:
                contrib = jax.lax.dot_general(
                    oh_dst.astype(jnp.int8), oh_src,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            acc[...] = acc[...] + contrib
            return 0

        if group_dot:
            jax.lax.fori_loop(0, 8, sub_stage, 0, unroll=unroll_j)
            if not weighted:
                contrib = jax.lax.dot_general(
                    ohd_buf[...], ohs_buf[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                contrib = jax.lax.dot_general(
                    ohd_buf[0], ohs_buf[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if wprec == "split2":
                    contrib = contrib + jax.lax.dot_general(
                        ohd_buf[1], ohs_buf[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            acc[...] = acc[...] + contrib
        else:
            jax.lax.fori_loop(0, 8, sub, 0, unroll=unroll_j)
        return 0

    jax.lax.fori_loop(0, ng, group, 0)

    A = acc[...].astype(jnp.float32)
    # HIGHEST (bf16 multi-pass ~ f32): the default single bf16 pass loses
    # ~1e-2 relative on the window values; A@win is amortized over the
    # tile's edges so the extra passes are ~free (A-build int8 dots
    # dominate the MXU budget and stay exact single-pass).
    out_t = jax.lax.dot_general(
        A, win[slot], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if reduce == "mean":
        cnt = jnp.sum(A, axis=1, keepdims=True)
        out_t = out_t / jnp.maximum(cnt, 1.0)
    out_ref[...] = out_t


def _window_tile_plan(row_ptr, col, *, T, edge_cap):
    """Shared dst-tile plan for the windowed SpMM/SDDMM kernels: per-tile
    window origins, edge-block origins/offsets, local row bounds, and the
    128-lane-blocked col table."""
    n = row_ptr.shape[0] - 1
    E = col.shape[0]
    nt = -(-n // T)
    n_pad = nt * T
    rp = row_ptr.astype(jnp.int32)
    if n_pad != n:
        rp = jnp.concatenate([rp, jnp.full((n_pad - n,), rp[n], jnp.int32)])

    starts = rp[jnp.arange(nt, dtype=jnp.int32) * T]
    rlo = rp[: n_pad].reshape(nt, T) - starts[:, None]  # local edge offsets
    rhi = (
        jnp.concatenate([rp[1: n_pad], rp[n_pad: n_pad + 1]]).reshape(nt, T)
        - starts[:, None]
    )
    ne = rhi[:, -1]
    # pad the tile axis to a multiple of 8: rlo/rhi stream in as (8, T)
    # blocks (see kernel comment)
    nt8 = -(-nt // 8) * 8
    if nt8 != nt:
        zpad = jnp.zeros((nt8 - nt, T), jnp.int32)
        rlo_p = jnp.concatenate([rlo, zpad])
        rhi_p = jnp.concatenate([rhi, zpad])
    else:
        rlo_p, rhi_p = rlo, rhi

    # per-tile window origin: min col over the tile's edges (segment_min)
    eidx = jnp.arange(E, dtype=jnp.int32)
    etile = jnp.searchsorted(starts, eidx, side="right").astype(jnp.int32) - 1
    w0s = jax.ops.segment_min(
        col.astype(jnp.int32), etile, num_segments=nt, indices_are_sorted=True
    )
    # empty tiles: segment_min yields int32-max; the x slab is padded by
    # W + 32 rows, so w0 only needs to stay within [0, N) — NO clip to
    # N - W (that would shift the window off the tile's actual span)
    w0s = jnp.where(ne > 0, w0s, 0) // 32 * 32

    blk0s = (starts >> 7) & ~jnp.int32(7)
    off0s = starts - blk0s * 128

    capb = (-(-(1024 + edge_cap) // 1024)) * 8
    pad_rows = capb + 8
    colp = jnp.concatenate([col.astype(jnp.int32), jnp.zeros((-E % 128,), jnp.int32)])
    col2 = jnp.concatenate(
        [colp.reshape(-1, 128), jnp.zeros((pad_rows, 128), jnp.int32)]
    )
    return dict(
        n=n, E=E, nt=nt, n_pad=n_pad, starts=starts, etile=etile,
        rlo_p=rlo_p, rhi_p=rhi_p, ne=ne, w0s=w0s, blk0s=blk0s, off0s=off0s,
        capb=capb, pad_rows=pad_rows, col2=col2,
    )


@functools.partial(
    jax.jit,
    static_argnames=("T", "W", "edge_cap", "reduce", "interpret", "wprec"),
)
def _spmm_window_impl(
    row_ptr, col, x, edge_weight, *, T, W, edge_cap, reduce, interpret=False,
    wprec="highest",
):
    E = col.shape[0]
    N, D = x.shape
    p = _window_tile_plan(row_ptr, col, T=T, edge_cap=edge_cap)
    n, nt, n_pad = p["n"], p["nt"], p["n_pad"]
    rlo_p, rhi_p, ne = p["rlo_p"], p["rhi_p"], p["ne"]
    w0s, blk0s, off0s = p["w0s"], p["blk0s"], p["off0s"]
    capb, pad_rows, col2 = p["capb"], p["pad_rows"], p["col2"]
    weighted = edge_weight is not None
    if weighted:
        wp = jnp.concatenate(
            [edge_weight.astype(jnp.float32), jnp.zeros((-E % 128,), jnp.float32)]
        )
        w2 = jnp.concatenate(
            [wp.reshape(-1, 128), jnp.zeros((pad_rows, 128), jnp.float32)]
        )
    else:
        w2 = jnp.zeros((8, 128), jnp.float32)
    xpad = jnp.concatenate([x.astype(jnp.float32), jnp.zeros((W + 32, D), jnp.float32)])

    # one-dot-per-group A-build (DESIGN.md 'Windowed-kernel acc traffic'):
    # stage the 8 sub-blocks' one-hots into [1024, .] buffers and contract
    # the whole group once — 1/8 the acc[T, W] read-modify-writes.
    # weighted 'highest' keeps the per-sub-block path (f32 staging would
    # double the buffer bytes for the one mode precision already pays for).
    group_dot = _GROUP_DOT and (not weighted or wprec in ("bf16", "split2"))
    scratch = [
        pltpu.VMEM((2, W, D), jnp.float32),
        pltpu.VMEM((2, capb, 128), jnp.int32),
        pltpu.VMEM((2, capb, 128), jnp.float32),
        pltpu.VMEM((T, W), jnp.float32 if weighted else jnp.int32),
    ]
    if group_dot:
        if weighted:
            nplane = 2 if wprec == "split2" else 1
            scratch += [
                pltpu.VMEM((nplane, 1024, T), jnp.bfloat16),
                pltpu.VMEM((1024, W), jnp.bfloat16),
            ]
        else:
            scratch += [
                pltpu.VMEM((1024, T), jnp.int8),
                pltpu.VMEM((1024, W), jnp.int8),
            ]
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    out = pl.pallas_call(
        functools.partial(
            _spmm_window_kernel, T=T, W=W, D=D, capb=capb, nt=nt,
            weighted=weighted, reduce=reduce, wprec=wprec,
            group_dot=group_dot,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w0s
            pl.BlockSpec(memory_space=pltpu.SMEM),  # blk0s
            pl.BlockSpec(memory_space=pltpu.SMEM),  # off0s
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ne
            pl.BlockSpec((8, T), lambda t: (t // 8, 0)),  # rlo (8-row block)
            pl.BlockSpec((8, T), lambda t: (t // 8, 0)),  # rhi
            pl.BlockSpec(memory_space=pl.ANY),  # col2
            pl.BlockSpec(memory_space=pl.ANY),  # w2
            pl.BlockSpec(memory_space=pl.ANY),  # x
        ],
        out_specs=pl.BlockSpec((T, D), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w0s, blk0s, off0s, ne, rlo_p, rhi_p, col2, w2, xpad)
    return out[:n]


def _segment_spmm_chunked(src_rows, take_ids, seg_ids, num_segments, weights,
                          chunk: int = 1 << 20):
    """dx[s] = Σ_e (w_e·) src_rows[take_ids[e]] for seg_ids[e] == s, in
    O(chunk x D) memory: an unchunked take materializes [E, D] (16 GB at
    E=16M D=256 — OOMs the chip at full-graph scale, the r4 sddmm lesson)."""
    E = take_ids.shape[0]
    if E <= chunk:
        msgs = jnp.take(src_rows, take_ids, axis=0, mode="clip")
        if weights is not None:
            msgs = msgs * weights[:, None]
        return jax.ops.segment_sum(msgs, seg_ids, num_segments=num_segments)
    pad = -E % chunk
    tk = jnp.concatenate([take_ids, jnp.zeros((pad,), take_ids.dtype)])
    sg = jnp.concatenate(
        [seg_ids, jnp.full((pad,), num_segments, seg_ids.dtype)]
    )
    wt = (
        jnp.concatenate([weights, jnp.zeros((pad,), weights.dtype)])
        if weights is not None else None
    )
    nch = tk.shape[0] // chunk

    def body(c, dx):
        t = lax.dynamic_slice(tk, (c * chunk,), (chunk,))
        s = lax.dynamic_slice(sg, (c * chunk,), (chunk,))
        msgs = jnp.take(src_rows, t, axis=0, mode="clip")
        if wt is not None:
            w = lax.dynamic_slice(wt, (c * chunk,), (chunk,))
            msgs = msgs * w[:, None]
        return dx.at[s].add(msgs, mode="drop")

    dx = jnp.zeros((num_segments, src_rows.shape[1]), src_rows.dtype)
    return lax.fori_loop(0, nch, body, dx)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10)
)
def _spmm_window_diff(row_ptr, col, x, edge_weight, W, edge_cap, tile,
                      reduce, interpret, weight_grad, wprec):
    return _spmm_window_impl(
        row_ptr, col, x, edge_weight, T=tile, W=W, edge_cap=edge_cap,
        reduce=reduce, interpret=interpret, wprec=wprec,
    )


def _sw_fwd(row_ptr, col, x, edge_weight, W, edge_cap, tile, reduce,
            interpret, weight_grad, wprec):
    out = _spmm_window_impl(
        row_ptr, col, x, edge_weight, T=tile, W=W, edge_cap=edge_cap,
        reduce=reduce, interpret=interpret, wprec=wprec,
    )
    # x is saved only when dw is wanted (it needs x); else just the shape
    save_x = edge_weight is not None and weight_grad
    return out, (row_ptr, col, x if save_x else x.shape, edge_weight)


def _sw_bwd(W, edge_cap, tile, reduce, interpret, weight_grad, wprec, res,
            ct):
    # dx[s] = Σ_{(s,d)∈E} w_e · (ct[d] / deg_d if mean else ct[d]) — the
    # TRANSPOSED SpMM, computed exactly through the XLA segment path (the
    # backward is a scatter over sources, outside the windowed kernel's
    # dst-tile structure).
    row_ptr, col, x_or_shape, edge_weight = res
    save_x = edge_weight is not None and weight_grad
    x_shape = x_or_shape.shape if save_x else x_or_shape
    n = row_ptr.shape[0] - 1
    E = col.shape[0]
    rp = row_ptr.astype(jnp.int32)
    edge_dst = (
        jnp.searchsorted(
            rp, jnp.arange(E, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1
    )
    ctd = ct
    if reduce == "mean":
        deg = (rp[1:] - rp[:-1]).astype(ct.dtype)
        ctd = ct / jnp.maximum(deg, 1)[:, None]
    dx = _segment_spmm_chunked(
        ctd, edge_dst, col.astype(jnp.int32), x_shape[0],
        edge_weight.astype(ct.dtype) if edge_weight is not None else None,
    )
    dw = None
    if edge_weight is not None:
        if weight_grad:
            # d loss / d w_e = <ct[dst_e], x[src_e]> — the SDDMM.  This
            # closes the r4 silent-zero-weight-grad landmine: learnable
            # edge weights (GAT attention) train through this path.
            # Routed to the XLA chunked per-edge SDDMM: silicon A/B r5b —
            # XLA 33.2 Medges/s vs the windowed kernel's 7.2 (exact) /
            # 7.3 (split2); per-edge one-hot row extraction costs
            # O(T or W) MACs/edge and loses to the descriptor-bound takes
            # (docs/DESIGN.md 'Windowed SDDMM').  Exact f32, same math as
            # the reference's per-edge backward.  reduce == 'mean' never
            # reaches here (weighted mean is rejected at the API).
            from .spmm import sddmm_chunked

            dw = sddmm_chunked(
                col.astype(jnp.int32), edge_dst,
                ct.astype(jnp.float32), x_or_shape.astype(jnp.float32),
            ).astype(edge_weight.dtype)
        else:
            # caller declared the weights constant (weight_grad=False, e.g.
            # mask-derived 0/1 weights): skip the SDDMM, return symbolic
            # zeros — differentiating the weights in this mode is a caller
            # bug, not a silent-zero surface
            dw = jnp.zeros_like(edge_weight)
    return (None, None, dx.astype(ct.dtype), dw)


_spmm_window_diff.defvjp(_sw_fwd, _sw_bwd)


def spmm_window(
    row_ptr: Array,
    col: Array,
    x: Array,
    *,
    window: int,
    edge_cap: int,
    tile: int = 256,
    reduce: str = "sum",
    edge_weight: Array | None = None,
    interpret: bool | None = None,
    weight_grad: bool = True,
    weight_precision: str = "highest",
) -> Array:
    """Fused pallas windowed SpMM over a locality-ordered CSR (see block
    comment above).  Size ``window``/``edge_cap`` with
    :func:`wholegraph_tpu.ops.spmm.plan_spmm_tiles` (same contract as
    spmm_tiled: any tile whose source span exceeds ``window`` yields zeros
    for the out-of-window edges — use the plan's ``feasible`` flag).
    Differentiable w.r.t. ``x`` (backward = exact transposed SpMM through
    the XLA segment path) AND ``edge_weight`` (backward = the windowed
    SDDMM ``<ct[dst], x[src]>`` on the same tile plan — learnable edge
    weights such as GAT attention train through this path; callers whose
    weights are constants, e.g. mask-derived 0/1, pass
    ``weight_grad=False`` to skip the SDDMM in the backward).
    ``weight_precision``: 'highest' = f32-HIGHEST weighted A-build (~6 bf16
    MXU passes, exact-grade); 'split2' = 2 bf16 hi+lo passes (~2^-16 rel on
    the weights — the gradient-grade config GAT attention uses; ~1/3 the
    A-build MXU cost).  Weighted
    ``mean`` is rejected: the kernel would normalise by the weight sum, not
    the edge count, silently diverging from :func:`ops.spmm.spmm`."""
    from ..utils.error import check_input

    check_input(reduce in ("sum", "mean"), f"unknown reduce {reduce!r}")
    check_input(
        not (reduce == "mean" and edge_weight is not None),
        "spmm_window: weighted mean is unsupported (weight-sum vs edge-count "
        "normalisation mismatch) — use reduce='sum' and normalise outside",
    )
    # +32 guards the w0 align-down (w0 = min_col rounded DOWN to 32 keeps
    # every in-plan col strictly inside [w0, w0 + W))
    W = -(-(window + 32) // 128) * 128
    check_input(x.shape[1] % 128 == 0, "dim must be a multiple of 128")
    # fail fast on scoped-VMEM overflow (16 MB limit; the remote compile
    # helper otherwise dies with an opaque subprocess error).  Empirical
    # r5 calibration: Mosaic's scoped total ~= 2.7x the scratch bytes
    # (window slab x2 + [T, W] acc + edge buffers) with only weak
    # unroll dependence — 17.82 MB at W=2176 unrolled-8, 16.22 MB at
    # W=2176 unroll-1, compiles at W=1152 (artifacts/r5_batch5.log,
    # exp_sampled_compile.log)
    D_ = x.shape[1]
    capb_ = (-(-(1024 + int(edge_cap)) // 1024)) * 8
    scratch = 4 * (2 * W * D_ + tile * W + 2 * capb_ * 128 * 2 + 2 * tile * D_)
    vmem_est = int(scratch * 2.8)
    check_input(
        vmem_est < 16 << 20,
        f"spmm_window scoped-VMEM estimate {vmem_est >> 20} MB exceeds the "
        f"16 MB budget (window={window} -> W={W}, dim={D_}, tile={tile}); "
        "shrink the window (misses join the caller's exact residual/"
        "fallback)",
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    check_input(weight_precision in ("highest", "split2", "bf16"),
                f"unknown weight_precision {weight_precision!r}")
    return _spmm_window_diff(
        row_ptr, col, x, edge_weight, W, int(edge_cap), tile, reduce,
        bool(interpret), bool(weight_grad), weight_precision,
    )


# ---------------------------------------------------------------------------
# Windowed SDDMM (round 4) — per-edge <a[dst], b[src]> on clustered CSRs
# ---------------------------------------------------------------------------
#
# Same dst-tile structure as spmm_window: per 128-edge sub-block, BOTH
# endpoint rows are selected from VMEM with int8 BYTE-PLANE one-hot matmuls
# (the bit-exact f32 select the windowed gather uses at 208 GB/s —
# gather_pallas.py) — a_e = oh_dst-select of the a tile, b_e = oh_src-select
# of the window slab — then e = rowsum(a_e * b_e) on the VPU.  No per-edge
# HBM gather of D-dim rows (the XLA sddmm's 2E row reads collapse into one
# window read per tile), and no dense [T, W] score matrix: the r4 design
# (S = a @ win^T + a per-group [1024, T] @ [T, W] HIGHEST extraction)
# measured 6.9 Medges/s on silicon — the f32-HIGHEST extraction matmul and
# its [1024, W] intermediate dominated everything.  The byte planes of the
# a tile and the window are extracted ONCE per tile into VMEM scratch.
# Output layout: per-tile [capb, 128] edge blocks at local positions
# (off0 + l); sddmm_window flattens back to [E] with one XLA take.


def _sddmm_window_kernel(
    w0s_ref, blk0s_ref, off0s_ref, ne_ref, rlo_ref, rhi_ref,
    col2_ref, a_ref, b_ref, out_ref,
    win, colbuf, aplanes, wplanes, sems, csems,
    *, T, W, D, capb, nt, mode="exact",
):
    t = pl.program_id(0)

    def wcopy(slot, tt):
        w0 = pl.multiple_of(w0s_ref[tt], 32)
        return pltpu.make_async_copy(
            b_ref.at[pl.ds(w0, W), :], win.at[slot], sems.at[slot]
        )

    def ccopy(slot, tt):
        b0 = pl.multiple_of(blk0s_ref[tt], 8)
        return pltpu.make_async_copy(
            col2_ref.at[pl.ds(b0, capb), :], colbuf.at[slot], csems.at[slot]
        )

    @pl.when(t == 0)
    def _first():
        wcopy(0, 0).start()
        ccopy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _pref():
        wcopy((t + 1) % 2, t + 1).start()
        ccopy((t + 1) % 2, t + 1).start()

    slot = t % 2
    wcopy(slot, t).wait()
    ccopy(slot, t).wait()

    off0 = off0s_ref[t]
    ne = ne_ref[t]
    w0 = w0s_ref[t]
    sub_sel8 = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0) == (t % 8)
    rlo_row = jnp.sum(jnp.where(sub_sel8, rlo_ref[...], 0), axis=0,
                      keepdims=True).reshape(1, T)
    rhi_row = jnp.sum(jnp.where(sub_sel8, rhi_ref[...], 0), axis=0,
                      keepdims=True).reshape(1, T)

    if mode == "exact":
        # byte planes of the a tile and the window, extracted once per tile
        # (biased by -128 to fit int8; the select adds the bias back per hit)
        a_i32 = jax.lax.bitcast_convert_type(a_ref[...], jnp.int32)
        w_i32 = jax.lax.bitcast_convert_type(win[slot], jnp.int32)
        for k in range(4):
            aplanes[k] = (((a_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
            wplanes[k] = (((w_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
    else:
        # split2: x ≈ hi + lo with two bf16 planes (hi = bf16(x), lo =
        # bf16(x - hi), ~2^-16 rel residual) — each one-hot select is ONE
        # bf16 MXU pass and the reassembly is a single f32 add (no bitwise
        # VPU work); for GRADIENT consumers (spmm_window dw) where ~1e-5
        # rel is ample
        a_f = a_ref[...]
        w_f = win[slot]
        a_hi = a_f.astype(jnp.bfloat16)
        w_hi = w_f.astype(jnp.bfloat16)
        aplanes[0] = a_hi
        aplanes[1] = (a_f - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wplanes[0] = w_hi
        wplanes[1] = (w_f - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    out_ref[...] = jnp.zeros((capb, 128), jnp.float32)

    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    lane_W = jax.lax.broadcasted_iota(jnp.int32, (128, W), 1)
    onehot8 = [
        (jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1) == j) for j in range(8)
    ]
    ng = (off0 + ne + 1023) // 1024

    def idot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def plane_select(oh, hit, planes):
        """Row select from VMEM planes via one-hot matmuls: mode 'exact' =
        4 bit-exact int8 byte-plane passes (gather_pallas.py's window-
        select trick, 208 GB/s-proven); mode 'split2' = 2 bf16 passes
        (hi+lo, ~2^-16 rel — one-hot rows select single terms, so each
        pass is exact on its plane)."""
        if mode != "exact":
            ohb = oh.astype(jnp.bfloat16)
            return (
                jax.lax.dot_general(
                    ohb, planes[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + jax.lax.dot_general(
                    ohb, planes[1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        oh8 = oh.astype(jnp.int8)
        acc = jnp.zeros((128, D), jnp.int32)
        for k in range(4):
            sel = idot(oh8, planes[k]) + jnp.where(hit, 128, 0)
            acc = acc | ((sel & 0xFF) << (8 * k))
        return jax.lax.bitcast_convert_type(acc, jnp.float32)

    def group(g, _):
        cT = _transpose8(colbuf[slot, pl.ds(g * 8, 8), :])  # [128, 8]
        cols8 = jnp.zeros((128, 8), jnp.float32)
        for j in range(8):
            colv = jnp.sum(jnp.where(onehot8[j], cT, 0), axis=1, keepdims=True)
            pl_sub = g * 1024 + j * 128 + iota_sub - off0
            valid = (pl_sub >= 0) & (pl_sub < ne)
            oh_src = (colv - w0 == lane_W) & valid  # [128, W]
            # dst one-hot against the tile axis: edge e hits tile row r iff
            # rlo[r] <= pl_sub[e] < rhi[r] (broadcast [128,1] vs [1,T])
            oh_dst_T = (pl_sub >= rlo_row) & (pl_sub < rhi_row) & valid
            a_e = plane_select(
                oh_dst_T, oh_dst_T.any(axis=1, keepdims=True), aplanes,
            )  # [128, D] = a[dst_e]
            b_e = plane_select(
                oh_src, oh_src.any(axis=1, keepdims=True), wplanes,
            )  # [128, D] = b[col_e]
            e_col = jnp.sum(a_e * b_e, axis=1, keepdims=True)  # [128, 1]
            # accumulate per-sub-block scores into lane j; ONE [128, 8] ->
            # [8, 128] transpose per group (8 per-sub-block [128,1]->[1,128]
            # cross-lane transposes were a measured disaster on v5e)
            cols8 = jnp.where(onehot8[j], e_col, cols8)
        out_ref[pl.ds(g * 8, 8), :] = jnp.transpose(cols8, (1, 0))
        return 0

    jax.lax.fori_loop(0, ng, group, 0)


@functools.partial(
    jax.jit, static_argnames=("T", "W", "edge_cap", "interpret", "mode")
)
def _sddmm_window_impl(row_ptr, col, a, b, *, T, W, edge_cap,
                       interpret=False, mode="exact"):
    E = col.shape[0]
    N, D = b.shape
    p = _window_tile_plan(row_ptr, col, T=T, edge_cap=edge_cap)
    n, nt, n_pad = p["n"], p["nt"], p["n_pad"]
    capb = p["capb"]

    a_pad = jnp.concatenate(
        [a.astype(jnp.float32), jnp.zeros((n_pad - n, D), jnp.float32)]
    )
    b_pad = jnp.concatenate(
        [b.astype(jnp.float32), jnp.zeros((W + 32, D), jnp.float32)]
    )

    nplanes, pdtype = (4, jnp.int8) if mode == "exact" else (2, jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(
            _sddmm_window_kernel, T=T, W=W, D=D, capb=capb, nt=nt, mode=mode,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w0s
            pl.BlockSpec(memory_space=pltpu.SMEM),  # blk0s
            pl.BlockSpec(memory_space=pltpu.SMEM),  # off0s
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ne
            pl.BlockSpec((8, T), lambda t: (t // 8, 0)),  # rlo
            pl.BlockSpec((8, T), lambda t: (t // 8, 0)),  # rhi
            pl.BlockSpec(memory_space=pl.ANY),  # col2
            pl.BlockSpec((T, D), lambda t: (t, 0)),  # a tile
            pl.BlockSpec(memory_space=pl.ANY),  # b (window source)
        ],
        out_specs=pl.BlockSpec((capb, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((nt * capb, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W, D), jnp.float32),
            pltpu.VMEM((2, capb, 128), jnp.int32),
            pltpu.VMEM((nplanes, T, D), pdtype),
            pltpu.VMEM((nplanes, W, D), pdtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(p["w0s"], p["blk0s"], p["off0s"], p["ne"], p["rlo_p"], p["rhi_p"],
      p["col2"], a_pad, b_pad)

    # flatten: edge e sits at tile etile[e], local block-lane position
    # off0[tile] + (e - starts[tile])
    eidx = jnp.arange(E, dtype=jnp.int32)
    etile = p["etile"]
    posl = p["off0s"][etile] + eidx - p["starts"][etile]
    flat_idx = etile * (capb * 128) + posl
    return jnp.take(out.reshape(-1), flat_idx, mode="clip")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _sddmm_window_diff(row_ptr, col, a, b, W, edge_cap, tile, interpret,
                       mode):
    return _sddmm_window_impl(
        row_ptr, col, a, b, T=tile, W=W, edge_cap=edge_cap,
        interpret=interpret, mode=mode,
    )


def _sdw_fwd(row_ptr, col, a, b, W, edge_cap, tile, interpret, mode):
    out = _sddmm_window_impl(
        row_ptr, col, a, b, T=tile, W=W, edge_cap=edge_cap,
        interpret=interpret, mode=mode,
    )
    return out, (row_ptr, col, a, b)


def _sdw_bwd(W, edge_cap, tile, interpret, mode, res, ct):
    # e_k = <a[dst_k], b[src_k]>:
    #   da[d] = Σ_{e∈row(d)} ct_e · b[src_e]  — the WEIGHTED windowed SpMM
    #     on the same tile plan (fused, no per-edge row reads);
    #   db[s] = Σ_{e: src_e=s} ct_e · a[dst_e] — the transposed direction
    #     (scatter over sources) through the exact XLA segment path.
    row_ptr, col, a, b = res
    da = _spmm_window_impl(
        row_ptr, col, b.astype(jnp.float32), ct.astype(jnp.float32),
        T=tile, W=W, edge_cap=edge_cap, reduce="sum", interpret=interpret,
        wprec="split2",  # ct is a cotangent: gradient-grade weights
    ).astype(a.dtype)
    E = col.shape[0]
    rp = row_ptr.astype(jnp.int32)
    edge_dst = (
        jnp.searchsorted(
            rp, jnp.arange(E, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        - 1
    )
    db = _segment_spmm_chunked(
        a, edge_dst, col.astype(jnp.int32), b.shape[0], ct.astype(a.dtype)
    ).astype(b.dtype)
    return (None, None, da, db)


_sddmm_window_diff.defvjp(_sdw_fwd, _sdw_bwd)


def sddmm_window(
    row_ptr: Array,
    col: Array,
    a: Array,
    b: Array,
    *,
    window: int,
    edge_cap: int,
    tile: int = 256,
    interpret: bool | None = None,
    select_mode: str = "exact",
) -> Array:
    """Windowed SDDMM over a locality-ordered CSR: e_k = <a[dst_k],
    b[col[k]]> for the CSR's dst-sorted edges (dst derived from row_ptr).
    Same plan contract as :func:`spmm_window` (plan_spmm_tiles; out-of-
    window edges yield zeros — gate on the plan's ``feasible``).
    Differentiable: da rides the weighted windowed SpMM on the same plan
    (fused), db the exact XLA transposed segment path.  ``select_mode``:
    'exact' = bit-exact 4x int8 byte-plane row selects; 'split2' = 2x bf16
    hi+lo selects (~2^-16 rel on the operand rows — for gradient
    consumers).  Reference analog: cuGraph-Ops fused mha_gat_n2n's SDDMM
    stage (gat_conv.py:22-102), XLA fallback ops/spmm.py sddmm."""
    from ..utils.error import check_input

    check_input(a.shape[1] == b.shape[1], "a/b dim mismatch")
    check_input(a.shape[1] % 128 == 0, "dim must be a multiple of 128")
    check_input(a.shape[0] == row_ptr.shape[0] - 1, "a rows != num_dst")
    check_input(select_mode in ("exact", "split2"),
                f"unknown select_mode {select_mode!r}")
    W = -(-(window + 32) // 128) * 128
    D_ = b.shape[1]
    capb_ = (-(-(1024 + int(edge_cap)) // 1024)) * 8
    nplanes = 4 if select_mode == "exact" else 2
    psize = 1 if select_mode == "exact" else 2
    vmem_est = (
        4 * (2 * W * D_ + 2 * capb_ * 128 + capb_ * 128)
        + nplanes * psize * D_ * (tile + W)
    )
    check_input(
        vmem_est < 12 << 20,
        f"sddmm_window VMEM estimate {vmem_est >> 20} MB exceeds the ~12 MB "
        f"budget (window={window} -> W={W}, dim={D_}, tile={tile})",
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _sddmm_window_diff(
        row_ptr, col, a, b, W, int(edge_cap), tile, bool(interpret),
        select_mode,
    )

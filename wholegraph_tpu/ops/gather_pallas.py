"""Pallas TPU gather kernel: DMA-pipelined row gather from HBM.

The local-take hot loop of the distributed gather (the analog of the
reference's vectorised gather kernel, cpp/src/wholememory_ops/functions/
gather_scatter_func.cuh:254-446, which moves 16B/thread through L2).  On TPU
the idiomatic form is a stream of row-sized async DMAs HBM→HBM with a ring of
in-flight copies, ids staged into SMEM block-by-block by the pallas pipeline.

XLA's stock gather lowers to a serial dynamic-slice loop (~80 GB/s on v5e for
1KB rows); keeping N_INFLIGHT row DMAs outstanding pushes toward the HBM
speed-of-light.

Mosaic constraint: 2-D HBM memrefs are (8,128)-tiled, so a single row of
[N, D] cannot be DMA-sliced.  The kernel instead views the table as
[N, D//128, 128]: slicing along the MAJOR axis copies whole (sublane, lane)
tiles and is legal for any D that is a multiple of 128 (pad rows to 128
otherwise, as the reference pads embedding rows to 16B alignment,
embedding.cpp:43-50).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gather_kernel(
    ids_ref, table_ref, out_ref, sems, *, per_step: int, n_inflight: int,
    ksub: int = 1,
):
    """ksub > 1: WIDE-ROW mode — the caller has reviewed the table as
    [N*ksub, P//ksub, 128] and each logical row moves as ksub independent
    sub-row DMAs (row r sub s lives at physical row r*ksub + s).  Keeps
    every descriptor in the 1-2KB sweet spot: whole-row slabs past ~2KB
    measured ~70 GB/s on v5e vs 203 at 2KB (docs/DESIGN.md wide-row
    section; reference handles any row size via its alignment dispatch,
    gather_scatter_func.cuh:211-250).

    Grid is 2-D (num_blocks, nsteps): the ids SMEM block is always the
    FULL id_block — Mosaic requires the block to equal XLA's 1-D s32 tile
    T(min(1024, len)), so shrinking the block to bound the unroll fails
    layout verification on hardware (invisible to CPU trace tests) — and
    each grid sub-step issues only ``per_step`` of the block's
    id_block*ksub DMAs to bound the trace-time unroll."""
    id_block = ids_ref.shape[0]
    base = pl.program_id(0) * id_block
    off = pl.program_id(1) * per_step

    def dma(j):
        g = off + j
        if ksub == 1:
            src, dst = ids_ref[g], base + g
        else:
            r, s = g // ksub, g % ksub
            src = ids_ref[r] * ksub + s
            dst = (base + r) * ksub + s
        return pltpu.make_async_copy(
            table_ref.at[src],
            out_ref.at[dst],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _wait():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, per_step, issue, 0, unroll=True)

    def drain(k, _):
        dma(per_step - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _wide_row_split(n_planes: int, itemsize: int) -> int:
    """Sub-DMAs per row (ksub) for the ring kernels — ALWAYS 1.

    The round-2 hypothesis (rows past ~2KB fall off a DMA sweet spot, so
    split them into <=2KB sub-slabs) was REFUTED by the round-3 hardware
    A/B (scripts/exp_widerow.py, v5e): whole-slab rows run 229-272 GB/s at
    dims 768/1024/1536 (3-6KB rows — the ring's FASTEST sizes, more bytes
    per ~8 ns descriptor) while every split k>=2 ran 32-119 GB/s (k extra
    descriptors per row dominate).  The split machinery stays in-tree and
    exact behind the explicit ``split=`` parameter for future A/Bs."""
    del n_planes, itemsize
    return 1


def _scatter_kernel(
    ids_ref, rows_ref, table_in_ref, out_ref, sems, *, per_step: int,
    n_inflight: int, ksub: int = 1,
):
    # out_ref aliases the donated table buffer (input_output_aliases);
    # table_in_ref is the same memory and is not read.  ksub > 1: wide-row
    # mode, table/rows re-viewed as [.*ksub, P//ksub, 128].  2-D grid +
    # per_step sub-stepping: see _gather_kernel (SMEM block must equal
    # XLA's s32 tile).
    del table_in_ref
    id_block = ids_ref.shape[0]
    base = pl.program_id(0) * id_block
    off = pl.program_id(1) * per_step

    def dma(j):
        g = off + j
        if ksub == 1:
            src, dst = base + g, ids_ref[g]
        else:
            r, s = g // ksub, g % ksub
            src = (base + r) * ksub + s
            dst = ids_ref[r] * ksub + s
        return pltpu.make_async_copy(
            rows_ref.at[src],
            out_ref.at[dst],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _wait():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, per_step, issue, 0, unroll=True)

    def drain(k, _):
        dma(per_step - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _ring_steps(id_block: int, ksub: int, per_step: int | None):
    """(per_step, nsteps) for the 2-D ring grid: default per_step caps
    the unrolled DMA issues per grid step at the standard ring's ~1024
    compile budget."""
    total = id_block * ksub
    if per_step is None:
        per_step = min(total, 1024)
    assert total % per_step == 0, (id_block, ksub, per_step)
    return per_step, total // per_step


@functools.partial(
    jax.jit, static_argnames=("id_block", "n_inflight", "split", "per_step"),
    donate_argnums=(0,),
)
def scatter_rows_pallas3(
    table3: Array, ids: Array, rows3: Array, *, id_block: int = 1024,
    n_inflight: int = 256, split: int | None = None,
    per_step: int | None = None,
) -> Array:
    """Native-tile-layout scatter: table3[ids[i]] = rows3[i], both in the
    kernel's ``[., D//128, 128]`` layout; the table3 buffer is donated and
    updated in place and the SAME buffer shape is returned.

    Use this form when the table is a LOOP CARRY (training/bench chains):
    the [N, D] <-> [N, D//128, 128] reshape is a real relayout (different
    XLA tilings, ~2x the scatter's own traffic per pass) that XLA hoists
    for loop-invariant gather operands but must re-run every iteration for
    a reshaped carry.

    split: wide-row sub-DMA count (auto like the gather ring: rows past
    ~2KB move as <=2KB sub-slabs; 1 disables)."""
    B = ids.shape[0]
    orig_shape = table3.shape
    P = table3.shape[1]
    assert B % id_block == 0, (B, id_block)
    assert rows3.shape[1:] == table3.shape[1:], (rows3.shape, table3.shape)
    ids = ids.astype(jnp.int32)
    ksub = (
        _wide_row_split(P, jnp.dtype(table3.dtype).itemsize)
        if split is None
        else split
    )
    if ksub > 1:
        assert P % ksub == 0, (P, ksub)
        table3 = table3.reshape(table3.shape[0] * ksub, P // ksub, 128)
        rows3 = rows3.reshape(B * ksub, P // ksub, 128)
    per_step, nsteps = _ring_steps(id_block, ksub, per_step)
    n_inflight = min(n_inflight, per_step)
    out = pl.pallas_call(
        functools.partial(
            _scatter_kernel, per_step=per_step, n_inflight=n_inflight, ksub=ksub
        ),
        grid=(B // id_block, nsteps),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i, s: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0},  # donated table buffer IS the output
    )(ids, rows3, table3)
    return out.reshape(orig_shape) if ksub > 1 else out


@functools.partial(jax.jit, static_argnames=("id_block", "n_inflight"), donate_argnums=(0,))
def scatter_rows_pallas(
    table: Array, ids: Array, rows: Array, *, id_block: int = 1024, n_inflight: int = 256
) -> Array:
    """table[ids[i]] = rows[i] via pipelined row DMAs (duplicate ids: winner
    unspecified, same caveat as the reference scatter).  The table buffer is
    donated and updated in place.  Flat [N, D] in/out; inside a loop with
    the table as carry prefer :func:`scatter_rows_pallas3` (relayout cost)."""
    B = ids.shape[0]
    N, D = table.shape
    assert D % 128 == 0 and B % id_block == 0
    assert rows.shape == (B, D)
    out3 = scatter_rows_pallas3(
        table.reshape(N, D // 128, 128),
        ids,
        rows.reshape(B, D // 128, 128),
        id_block=id_block,
        n_inflight=n_inflight,
    )
    return out3.reshape(N, D)


@functools.partial(
    jax.jit, static_argnames=("id_block", "n_inflight", "split", "per_step")
)
def _gather_rows_pallas3_impl(
    table: Array, ids: Array, *, id_block: int = 1024, n_inflight: int = 256,
    split: int | None = None, per_step: int | None = None,
) -> Array:
    """out[i] = table[ids[i]] via pipelined row DMAs, returned in the
    kernel's native tile layout ``[B, D//128, 128]`` (avoids the ~25% cost
    of relaying out to a flat [B, D] minor layout; callers that feed a
    reduction can keep the 3-D form).

    table: [N, D] with D a multiple of 128, or already in the native tile
    layout [N, D//128, 128] (loop-carry form — no relayout happens then);
    ids: [B] int32, B a multiple of id_block.

    split: sub-DMAs per row for WIDE rows (default auto: rows past the
    ~2KB descriptor sweet spot move as <=2KB sub-slabs via a re-view of the
    table as [N*split, P//split, 128] — byte-identical layout, so the
    re-view is free; 1 disables).  Keeps dim-768/1024 f32 gathers at the
    2KB-row rate instead of the measured ~70 GB/s whole-slab cliff.
    """
    B = ids.shape[0]
    if table.ndim == 3:
        assert table.shape[-1] == 128, table.shape
        table3 = table
    else:
        N, D = table.shape
        assert D % 128 == 0, f"dim {D} must be a multiple of 128"
        table3 = table.reshape(N, D // 128, 128)
    assert B % id_block == 0, (B, id_block)
    ids = ids.astype(jnp.int32)
    N3, P = table3.shape[0], table3.shape[1]
    ksub = (
        _wide_row_split(P, jnp.dtype(table.dtype).itemsize)
        if split is None
        else split
    )
    if ksub > 1:
        assert P % ksub == 0, (P, ksub)
        table3 = table3.reshape(N3 * ksub, P // ksub, 128)
    per_step, nsteps = _ring_steps(id_block, ksub, per_step)
    n_inflight = min(n_inflight, per_step)
    out = pl.pallas_call(
        functools.partial(
            _gather_kernel, per_step=per_step, n_inflight=n_inflight, ksub=ksub
        ),
        grid=(B // id_block, nsteps),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i, s: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B * ksub,) + table3.shape[1:], table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table3)
    if ksub > 1:
        out = out.reshape(B, P, 128)
    return out


@jax.custom_vjp
def gather_rows_pallas3(table: Array, ids: Array) -> Array:
    """Differentiable native-layout gather (default ring parameters);
    backward = scatter-add of the cotangent rows."""
    return _gather_rows_pallas3_impl(table, ids)


def _g3_fwd(table, ids):
    return _gather_rows_pallas3_impl(table, ids), (ids, table)


def _g3_bwd(res, ct):
    ids, table = res
    N = table.shape[0]
    clipped = jnp.clip(ids, 0, N - 1)
    # ct is [B, D//128, 128]; scatter-add in whichever layout `table` uses
    # (3-D native carries stay 3-D — the 2-D reshape is a real relayout).
    ct = ct.reshape((ct.shape[0],) + table.shape[1:])
    dtable = (
        jnp.zeros(table.shape, ct.dtype)
        .at[clipped]
        .add(ct, mode="drop")
        .astype(table.dtype)
    )
    return dtable, jnp.zeros(ids.shape, jax.dtypes.float0)


gather_rows_pallas3.defvjp(_g3_fwd, _g3_bwd)


def gather_rows_pallas(
    table: Array, ids: Array, *, id_block: int = 1024, n_inflight: int = 256
) -> Array:
    """Flat-layout wrapper: [B, D] output (one relayout pass over B*D)."""
    B = ids.shape[0]
    D = table.shape[1]
    out3 = _gather_rows_pallas3_impl(
        table, ids, id_block=id_block, n_inflight=n_inflight
    )
    return out3.reshape(B, D)


# ---------------------------------------------------------------------------
# Lane-slab gather: one DMA descriptor per id covering `slab` 128-lane blocks
# ---------------------------------------------------------------------------


def _gather_slab_kernel(
    ids_ref, table_ref, out_ref, sems, *, per_step: int, n_inflight: int,
    slab: int,
):
    """out[(base+g)*slab : +slab] = table[ids[g] : ids[g]+slab]: each DMA
    moves ``slab`` CONSECUTIVE major-axis rows (contiguous in HBM) as ONE
    descriptor — the descriptor-rate savings the per-row ring cannot get
    for adjacent rows (ring cost is ~8 ns/descriptor regardless of size up
    to ~2KB, docs/DESIGN.md)."""
    id_block = ids_ref.shape[0]
    base = pl.program_id(0) * id_block
    off = pl.program_id(1) * per_step

    def dma(j):
        g = off + j
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(ids_ref[g], slab)],
            out_ref.at[pl.ds((base + g) * slab, slab)],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _wait():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, per_step, issue, 0, unroll=True)

    def drain(k, _):
        dma(per_step - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _gather_slabs_impl(
    table3: Array, blk_start: Array, nb: int, *, id_block: int = 1024,
    n_inflight: int = 256,
) -> Array:
    """out[i*nb : (i+1)*nb] = table3[blk_start[i] : blk_start[i] + nb]:
    ONE descriptor per id covering ``nb`` consecutive major rows of a
    [nblk, P, 128] table.  blk_start caller-clamped to [0, nblk - nb]."""
    B = blk_start.shape[0]
    nblk, P = table3.shape[0], table3.shape[1]
    assert table3.shape[2] == 128 and nblk >= nb, (table3.shape, nb)
    pad_b = -B % id_block
    ids = blk_start.astype(jnp.int32)
    if pad_b:
        ids = jnp.concatenate([ids, jnp.zeros((pad_b,), jnp.int32)])
    per_step, nsteps = _ring_steps(id_block, 1, None)
    n_inflight = min(n_inflight, per_step)
    out = pl.pallas_call(
        functools.partial(
            _gather_slab_kernel, per_step=per_step, n_inflight=n_inflight,
            slab=nb,
        ),
        grid=((B + pad_b) // id_block, nsteps),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i, s: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(((B + pad_b) * nb, P, 128), table3.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table3)
    return out[: B * nb]


def gather_lane_slabs_pallas(
    c2: Array, blk_start: Array, nb: int, *, id_block: int = 1024,
    n_inflight: int = 256,
) -> Array:
    """out[i] = c2[blk_start[i] : blk_start[i] + nb] flattened to
    [B, nb*128]: the sampler's col-window fetch with ONE descriptor per
    center (consecutive col blocks are contiguous in HBM; fetching them as
    nb separate ring rows pays nb descriptors for one slab's bytes).

    c2: [nblk, 128] int32 (the 128-lane-blocked col table); blk_start: [B]
    int32, caller-clamped to [0, nblk - nb].
    """
    B = blk_start.shape[0]
    nblk = c2.shape[0]
    assert c2.shape[1] == 128, c2.shape
    out = _gather_slabs_impl(
        c2.reshape(nblk, 1, 128), blk_start, nb, id_block=id_block,
        n_inflight=n_inflight,
    )
    return out.reshape(B, nb * 128)


# ---------------------------------------------------------------------------
# Fused per-row lane select: out[b, k] = lanes[b, loc[b, k]]
# ---------------------------------------------------------------------------


def _select_lanes_kernel(lanes_ref, loc_ref, out_ref, *, K: int):
    """out[b, k] = lanes[b, loc[b, k]] for k < K (0 when loc is outside
    [0, S)); loc/out are lane-padded to 128.  The whole [Bt, K, S] one-hot
    lives as K transient [Bt, S] vregs in VMEM — expressing this select as
    a broadcast-compare-reduce at the XLA level materialises the [B, K, S]
    intermediate in HBM (~1 GB at B=64K, K=15, S=256: the uniform
    sampler's dominant cost before r5, scripts/exp_uniform_ladder.py)."""
    lanes = lanes_ref[...]
    loc = loc_ref[...]
    iota_s = lax.broadcasted_iota(jnp.int32, lanes.shape, 1)
    iota_o = lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for k in range(K):
        lk = lax.broadcast_in_dim(loc[:, k], lanes.shape, (0,))
        colk = jnp.sum(
            jnp.where(iota_s == lk, lanes, 0), axis=1, keepdims=True
        )
        acc = acc + jnp.where(iota_o == k, colk, 0)
    out_ref[...] = acc


def select_lanes_pallas(
    lanes: Array, loc: Array, K: int, *, tile: int = 512
) -> Array:
    """Per-row lane gather ``out[b, k] = lanes[b, loc[b, k]]`` (int32), 0
    when ``loc`` falls outside ``[0, S)``.

    TPU-only fusion kernel for the sampler's col-block selects (the
    reference reads each sampled col with one global-memory load inside the
    sampling kernel, unweighted_sample_without_replacement_func.cuh:132-282;
    here the cols arrive as whole 128-lane blocks and this kernel does the
    in-register lane pick).  ``lanes`` [B, S] int32 with S a multiple of
    128; ``loc`` [B, K] int32.  B is padded to ``tile`` internally.
    """
    B, S = lanes.shape
    assert S % 128 == 0, S
    Kp = loc.shape[1]
    assert K <= Kp and K <= 128, (K, Kp)
    if Kp != 128:
        loc = jnp.concatenate(
            [loc, jnp.full((B, 128 - Kp), -1, jnp.int32)], axis=1
        )
    pad_b = -B % tile
    if pad_b:
        lanes = jnp.concatenate(
            [lanes, jnp.zeros((pad_b, S), lanes.dtype)], axis=0
        )
        loc = jnp.concatenate(
            [loc, jnp.full((pad_b, 128), -1, jnp.int32)], axis=0
        )
    out = pl.pallas_call(
        functools.partial(_select_lanes_kernel, K=K),
        grid=((B + pad_b) // tile,),
        in_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0)),
            pl.BlockSpec((tile, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B + pad_b, 128), jnp.int32),
    )(lanes.astype(jnp.int32), loc.astype(jnp.int32))
    return out[:B, :K]


# ---------------------------------------------------------------------------
# Windowed gather: sorted ids, multi-row DMAs + MXU one-hot select
# ---------------------------------------------------------------------------
#
# The single-row DMA ring above is descriptor-rate-bound on v5e (~8 ns per
# descriptor => 127 GB/s at 1KB rows, regardless of ring strategy — exhaustive
# matrix in docs/DESIGN.md).  The one door past that wall is moving >1 row per
# descriptor.  For SORTED ids this kernel fetches a whole contiguous WINDOW of
# the table per id-tile with ONE large DMA (a sublane-tile-aligned [window, D]
# block of the 2-D HBM memref), then selects the requested rows on the MXU with a
# one-hot matmul — the TPU-native analog of the reference's coalesced
# vectorised gather (gather_scatter_func.cuh:211-446, which coalesces 16B
# accesses across a warp; here we coalesce rows across a DMA descriptor).
#
# Exactness: a one-hot matmul is a bit-exact row copy provided no operand is
# rounded.  bf16 tables: one-hot is exactly representable, accumulation in
# f32 adds exactly one nonzero term => exact.  f32 tables: the kernel
# selects the 4 BYTE planes of the bitcast window with an int8 one-hot on
# the MXU's s8xs8->s32 path and reassembles the bits — no float arithmetic
# touches the payload, so every bit pattern (NaN/Inf/-0/denormal) survives.
# (Verified bit-exact on hardware in tests/test_pallas_tpu.py.)
#
# Ids outside a tile's window produce ZERO rows (the one-hot row is all
# zeros) — the same observable-miss contract as the masked kernels below; use
# window_coverage() to size the window or to detect misses.
#
# GROUPED SUB-TILES (group > 1): each grid step has a fixed ~0.6 us overhead
# on v5e (measured, scripts/exp_window_gather*.py), which caps the ungrouped
# kernel at ~180 GB/s for 1KB rows.  Grouping amortizes it: ONE window DMA of
# ``window`` rows serves ``group`` sub-tiles of ``tile`` ids each; sub-tile g
# selects from its own DYNAMIC window slice [s_g, s_g + wsub), where s_g is
# the sub-tile's first id relative to the window start (computed on host,
# aligned down to _WALIGN, clamped to window - wsub; a dynamic VMEM offset).
# Per-sub-tile starts keep wsub at ~tile/density at ANY density — a static
# g*tile grid would need wsub to absorb the CUMULATIVE drift
# group*tile*(1/d - 1) and goes MXU-bound as density drops (measured 91 GB/s
# at d=0.82 static vs 161 dynamic, scripts/exp_window_gather4.py).  Ids
# drifting past their sub-tile's wsub slack miss (zero row) and are repaired
# by local_take_sorted's conditional pass.  Measured v5e, 1KB f32 rows,
# B=512K sorted: d=0.95 => 236 GB/s, d=0.82 => 161 GB/s (tile=128 wsub=224
# group=8; ungrouped peak 180 at d~1, single-row ring 127).
#
# Crossover vs the DMA ring (v5e, rows of R bytes, sorted-id density d =
# rows-referenced / window-span):  ring = R / 8ns;  window = min(HBM fetch of
# window/(tile*group) rows per useful row, MXU one-hot rate over wsub) with
# measured efficiency factors.  choose_gather_kernel() encodes this; for
# D=256 the window path wins for d >~ 0.45 (f32) / ~0.15 (bf16).


_WALIGN = 32  # window starts aligned to HBM sublane tiling (8 f32 / 16 bf16)


def _window_gather_kernel(
    w0s_ref, starts_ref, ids_ref, table_ref, out_ref, win, sems,
    *, tile, wsub, group, window, nt, pack_planes=False, splits=1,
):
    t = pl.program_id(0)
    sub = window // splits

    def copy(slot, tt, s):
        # w0s are _WALIGN-aligned by construction; tell Mosaic so the tiled
        # HBM slice is provably tile-aligned.  The slab is fetched as
        # ``splits`` parallel sub-slab DMAs: one whole-window DMA streams on
        # a single engine (~310 GB/s effective); 4 concurrent sub-slabs
        # measured 212 vs 196 GB/s end-to-end at the d=0.8 bench config
        # (scripts/exp_window_reuse2.py, r4 on v5e).
        w0 = pl.multiple_of(w0s_ref[tt], _WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0 + s * sub, sub), :],
            win.at[slot, pl.ds(s * sub, sub), :],
            sems.at[slot, s],
        )

    @pl.when(t == 0)
    def _first():
        for s in range(splits):
            copy(0, 0, s).start()

    @pl.when(t + 1 < nt)
    def _prefetch():
        for s in range(splits):
            copy((t + 1) % 2, t + 1, s).start()

    slot = t % 2
    for s in range(splits):
        copy(slot, t, s).wait()
    w0 = w0s_ref[t]
    dtype = out_ref.dtype

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def idot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    # One small one-hot matmul per sub-tile over its DYNAMIC window slice
    # [s_g, s_g + wsub) — s_g precomputed on host (aligned + clamped), read
    # from SMEM; the group loop is unrolled at trace time.
    for g in range(group):
        base = g * tile
        s_g = pl.multiple_of(starts_ref[t * group + g], _WALIGN)
        ids_g = ids_ref[base:base + tile, :]  # [tile, 1] int32
        wslice = win[slot, pl.ds(s_g, wsub), :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, wsub), 1)
        match = ids_g - (w0 + s_g) == col
        if dtype == jnp.bfloat16:
            # one-hot is exactly representable in bf16 and the f32
            # accumulator adds exactly one nonzero term => bit-exact copy
            rows = bdot(match.astype(jnp.bfloat16), wslice)
            out_ref[base:base + tile, :] = rows.astype(dtype)
        else:
            # bit-exact f32 select via the int8 MXU (s8xs8->s32 runs at 2x
            # the bf16 rate on v5e): select each of the 4 BYTE planes of the
            # bitcast window with an int8 one-hot and reassemble the bits.
            # Planes are biased by -128 to fit int8; hit rows add the bias
            # back, miss rows stay all-zero (0.0f), preserving the zero-row
            # miss contract.  Measured 208 GB/s vs 159 for the 3-pass bf16
            # mantissa split at d=0.8 (scripts/exp_int8_select.py); exact
            # for every bit pattern including NaN/Inf/-0 since no float
            # arithmetic touches the payload.
            oh8 = match.astype(jnp.int8)
            hit = match.any(axis=1, keepdims=True)  # [tile, 1]
            w_i32 = jax.lax.bitcast_convert_type(wslice, jnp.int32)
            D_out = out_ref.shape[-1]
            if pack_planes:
                # round-3 variant: the 4 byte planes concatenated along the
                # LANE axis => ONE [tile, wsub] @ [wsub, 4*D] int8 matmul
                # instead of 4 — same flops, 4x larger N dim, one weight
                # stream per sub-tile (the select is weight-reload-bound at
                # ~25% MXU util; scripts/exp_window_packed.py A/Bs this)
                planes = jnp.concatenate(
                    [
                        (((w_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
                        for k in range(4)
                    ],
                    axis=1,
                )  # [wsub, 4*D]
                sel_all = idot(oh8, planes) + jnp.where(hit, 128, 0)
                acc = jnp.zeros((tile, D_out), jnp.int32)
                for k in range(4):
                    sel = sel_all[:, k * D_out:(k + 1) * D_out]
                    acc = acc | ((sel & 0xFF) << (8 * k))
            else:
                acc = jnp.zeros((tile, D_out), jnp.int32)
                for k in range(4):
                    plane = (((w_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
                    sel = idot(oh8, plane) + jnp.where(hit, 128, 0)
                    acc = acc | ((sel & 0xFF) << (8 * k))
            out_ref[base:base + tile, :] = jax.lax.bitcast_convert_type(
                acc, jnp.float32
            )


def _window_starts(padded_ids: Array, n_rows: int, tile, window, group, wsub):
    """(w0s [nt], starts [nt*group]) — the per-step window origins and
    per-sub-tile dynamic slice starts, aligned down to _WALIGN and clamped
    exactly as the kernel requires."""
    step = tile * group
    nmax = (n_rows - window) // _WALIGN * _WALIGN
    w0s = jnp.clip(padded_ids[::step] // _WALIGN * _WALIGN, 0, nmax)
    firsts = padded_ids[::tile].reshape(-1, group)
    starts = (firsts - w0s[:, None]) // _WALIGN * _WALIGN
    starts = jnp.clip(starts, 0, window - wsub)
    return w0s.astype(jnp.int32), starts.reshape(-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "window", "group", "wsub", "pack_planes", "splits"),
)
def gather_rows_window(
    table: Array, ids: Array, *, tile: int = 256, window: int = 1024,
    group: int = 1, wsub: int | None = None, pack_planes: bool = False,
    splits: int = 0,
) -> Array:
    """out[i] = table[ids[i]] for SORTED ids via windowed multi-row DMAs.

    Per step of ``tile * group`` consecutive ids, one DMA fetches ``window``
    table rows starting at the step's first id (aligned down to the HBM
    sublane tiling); each of the ``group`` sub-tiles of ``tile`` ids selects
    its rows from its own dynamic window slice ``[s_g, s_g + wsub)`` — s_g
    anchored at the sub-tile's first id — by a bit-exact MXU one-hot matmul.
    Ids falling outside their sub-tile's slice return ZERO rows (use
    :func:`window_coverage` to check).  Requires ``window + _WALIGN <= N``.

    Float dtypes only (f32 exact via 3-pass bf16 split; bf16 exact natively).

    ``splits`` issues the window as that many parallel sub-slab DMAs.  An
    early r4 probe read 212 vs 196 GB/s for splits=4, but the same-session
    A/B (scripts/exp_split_ab.py) put the difference inside the tunnel's
    ±20% noise (medians: split1 218 / split4 196 / split2 190), so the
    default stays the single proven slab DMA; splits>1 is opt-in
    (bit-exact — tests/test_pallas_tpu.py::test_gather_rows_window_splits).
    """
    B = ids.shape[0]
    N, D = table.shape
    step = tile * group
    if wsub is None:
        wsub = window - (group - 1) * tile
    if splits == 0:
        splits = 1
    assert window % splits == 0 and (window // splits) % _WALIGN == 0, (
        window, splits)
    assert D % 128 == 0, D
    assert window % _WALIGN == 0 and wsub % _WALIGN == 0, (window, wsub)
    assert tile <= wsub <= window, (window, tile, group, wsub)
    assert N >= window + _WALIGN, (N, window)
    assert table.dtype in (jnp.float32, jnp.bfloat16), table.dtype
    ids = ids.astype(jnp.int32)
    pad = -B % step
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), N, jnp.int32)])
    Bp = ids.shape[0]
    nt = Bp // step
    w0s, starts = _window_starts(ids, N, tile, window, group, wsub)
    out = pl.pallas_call(
        functools.partial(
            _window_gather_kernel, tile=tile, wsub=wsub, group=group,
            window=window, nt=nt, pack_planes=pack_planes, splits=splits,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w0s, whole
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts, whole
            pl.BlockSpec((step, 1), lambda t: (t, 0)),  # ids column, pipelined
            pl.BlockSpec(memory_space=pltpu.ANY),  # table, HBM
        ],
        out_specs=pl.BlockSpec((step, D), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, D), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, window, D), table.dtype),
            pltpu.SemaphoreType.DMA((2, splits)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, starts, ids.reshape(Bp, 1), table)
    return out[:B]


def _window_miss(padded_ids: Array, n_rows: int, tile, window, group, wsub=None):
    """Per-id miss mask mirroring _window_gather_kernel's aligned+clamped
    window starts and dynamic per-sub-tile slices exactly.  padded_ids length
    must be a multiple of tile*group."""
    if wsub is None:
        wsub = window - (group - 1) * tile
    ids32 = padded_ids.astype(jnp.int32)
    w0s, starts = _window_starts(ids32, n_rows, tile, window, group, wsub)
    sub = ids32.reshape(-1, group, tile)
    origin = w0s[:, None] + starts.reshape(-1, group)
    off = sub - origin[:, :, None]
    return ((off < 0) | (off >= wsub)).reshape(-1)


def window_coverage(
    ids: Array, n_rows: int, *, tile: int = 256, window: int = 1024,
    group: int = 1, wsub: int | None = None,
):
    """For sorted ids, the fraction of ids that fall inside their sub-tile's
    window slice (rows gather_rows_window would return non-zero; mirrors the
    kernel's aligned+clamped window starts exactly) and the sorted-id density
    (distinct-rows / span) that drives the ring-vs-window crossover.
    Returns (covered_fraction, density), both device scalars."""
    B = ids.shape[0]
    step = tile * group
    pad = -B % step
    idp = ids.astype(jnp.int32)
    if pad:
        idp = jnp.concatenate([idp, jnp.broadcast_to(idp[-1:], (pad,))])
    covered = (~_window_miss(idp, n_rows, tile, window, group, wsub)).sum() - pad
    span = jnp.maximum(idp[-1] - idp[0] + 1, 1)
    distinct = 1 + (idp[1:] != idp[:-1]).sum()
    return covered / B, distinct / span


_REPAIR_CAP = 4096  # compacted-repair capacity (ids); beyond it, full repair


@functools.partial(jax.jit, static_argnames=("tile", "window", "group", "wsub"))
def _local_take_sorted_impl(
    shard: Array, slots: Array, *, tile: int, window: int, group: int, wsub: int
) -> Array:
    N, D = shard.shape
    B = slots.shape[0]
    slots = jnp.clip(slots.astype(jnp.int32), 0, N - 1)
    out = gather_rows_window(
        shard, slots, tile=tile, window=window, group=group, wsub=wsub
    )
    # Repair ladder for ids outside their sub-tile's window slice; lax.cond
    # => repair kernels only RUN on batches that actually miss, so
    # well-windowed batches pay one reduce and nothing else.
    #   few misses  -> compact them into a _REPAIR_CAP buffer, one small
    #                  unmasked ring + scatter-merge (~8 ns/id over the CAP);
    #   many misses -> full-batch unmasked ring (hits fetch row 0, merged
    #                  away).  Unmasked both times: the masked ring's
    #                  conditional DMAs cost ~50 ns/id whether they fire or
    #                  not (measured, scripts/exp_lts_diag.py: 27 ms at
    #                  B=512K vs ~4.5 ms unmasked), so issuing every DMA
    #                  unconditionally is 5-6x cheaper than skipping.
    step = tile * group
    pad = -B % step
    padded = (
        jnp.concatenate([slots, jnp.full((pad,), N, jnp.int32)]) if pad else slots
    )
    miss = _window_miss(padded, N, tile, window, group, wsub)[:B]
    nmiss = miss.sum()
    cap = min(_REPAIR_CAP, B // 1024 * 1024)

    def small_repair(o):
        pos = jnp.nonzero(miss, size=cap, fill_value=B)[0]
        rep = jnp.where(pos < B, slots[jnp.minimum(pos, B - 1)], 0)
        fix = gather_rows_pallas(shard, rep.astype(jnp.int32))
        return o.at[pos].set(fix, mode="drop")

    def full_repair(o):
        rep = jnp.maximum(_pad_ids(jnp.where(miss, slots, 0), 1024), 0)
        fix = gather_rows_pallas(shard, rep)[:B]
        return jnp.where(miss[:, None], fix, o)

    def repair(o):
        return lax.cond(nmiss <= cap, small_repair, full_repair, o)

    return lax.cond(nmiss > 0, repair, lambda o: o, out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _local_take_sorted_vjp(shard, slots, tile, window, group, wsub):
    return _local_take_sorted_impl(
        shard, slots, tile=tile, window=window, group=group, wsub=wsub
    )


def _lts_fwd(shard, slots, tile, window, group, wsub):
    return _local_take_sorted_vjp(shard, slots, tile, window, group, wsub), (
        slots, shard,
    )


def _lts_bwd(tile, window, group, wsub, res, ct):
    slots, shard = res
    clipped = jnp.clip(slots, 0, shard.shape[0] - 1)
    dshard = (
        jnp.zeros(shard.shape, ct.dtype)
        .at[clipped]
        .add(ct, mode="drop")
        .astype(shard.dtype)
    )
    return dshard, jnp.zeros(slots.shape, jax.dtypes.float0)


_local_take_sorted_vjp.defvjp(_lts_fwd, _lts_bwd)


def _align_up(x: float) -> int:
    return -(-int(x) // _WALIGN) * _WALIGN


def _window_plan(
    density: float, tile: int | None, group: int | None, dim: int = 256,
    itemsize: int = 4,
):
    """(tile, window, group, wsub) for a target sorted-id density.  With
    dynamic per-sub-tile starts, wsub only needs the WITHIN-sub-tile span
    (~tile/d) plus slack, independent of group; the step window needs the
    whole step span (~tile*group/d).  group=8/tile=128 is the measured v5e
    sweet spot (scripts/exp_window_gather4.py); the window is capped so the
    double-buffered VMEM scratch stays under ~8 MB, trading coverage (the
    repair pass absorbs the tail) at very low density.

    Slack sizing: the span of k sorted ids drawn at density d is
    ~k/d +- sqrt(k(1-d))/d (negative-binomial).  wsub takes 5 sigma of
    slack plus the worst-case _WALIGN-1 alignment loss of its aligned-down
    start — there are thousands of sub-tiles per batch, so per-sub-tile
    misses must be ~1e-6 events (wsub=192 at d=0.8 leaves 1 row of slack
    and repairs EVERY batch; 224 leaves 33 and essentially never; 4 sigma
    at d=0.5 still repaired most batches — measured, /tmp/exp_lts_v*.log).
    The step window takes only 3 sigma + the MEAN alignment loss: the
    compacted repair is cheap (~0.3 ms) for the rare overflowing step,
    while window width costs fetch bandwidth on EVERY step (1376 measured
    242 GB/s vs 1440's ~204 at d=0.8)."""
    import math

    d = max(min(density, 1.0), 0.05)
    tile = 128 if tile is None else tile
    group = 8 if group is None else group

    def sig(k):  # sigma of the span of k sorted ids at density d (neg-binom)
        return math.sqrt(k * (1.0 - d)) / d

    wsub = _align_up(tile / d + 5.0 * sig(tile) + (_WALIGN - 1))
    step = tile * group
    # window rounds up to a MULTIPLE OF 128: measured 2x cliff otherwise
    # (win=1376 -> 4.9 ms vs win=1408 -> 2.85 ms at d=0.8, same batch —
    # scripts/exp_bench_ab.py; the window slab DMA degrades off 128-row
    # granularity)
    window = max(int(step / d + 3.0 * sig(step) + _WALIGN // 2), wsub)
    window = -(-window // 128) * 128
    cap = max((8 << 20) // (2 * dim * itemsize) // 128 * 128, 128)
    window = min(window, cap)
    wsub = min(wsub, window)
    return tile, window, group, wsub


def local_take_sorted(
    shard: Array,
    slots: Array,
    *,
    tile: int | None = None,
    window: int | None = None,
    group: int | None = None,
    wsub: int | None = None,
    density: float = 1.0,
) -> Array:
    """Exact local gather for (mostly) SORTED slots: the grouped windowed
    multi-row DMA + MXU one-hot kernel for in-window rows, plus a compacted
    single-row repair pass (run only when a miss occurs) — always exact,
    fastest when sorted-id density is high (dense deduped batches; see
    choose_gather_kernel).  ``density`` (expected distinct-rows/span) sizes
    the default tile/window/group/wsub so misses stay rare.

    Falls back to the general path for dtypes/shapes the window kernel does
    not support.  Reference analog: the sorted/unique indices fast path of
    gather_op.cpp:118-120 + sort_unique_indices_func.cu.
    """
    if shard.ndim == 3:  # native-layout carry: window kernel is 2-D-only,
        # the exact ring serves it without any table relayout
        B = slots.shape[0]
        ids = jnp.clip(
            _pad_ids(slots.astype(jnp.int32), 1024), 0, shard.shape[0] - 1
        )
        if jax.default_backend() != "tpu" or B < 4096:
            return jnp.take(shard, slots, axis=0, mode="clip").reshape(B, -1)
        return gather_rows_pallas3(shard, ids).reshape(ids.shape[0], -1)[:B]
    N, D = shard.shape
    auto = tile is None and window is None and group is None and wsub is None
    dtile, dwindow, dgroup, dwsub = _window_plan(
        density, tile, group, D, jnp.dtype(shard.dtype).itemsize
    )
    tile = dtile if tile is None else tile
    group = dgroup if group is None else group
    if window is None:
        window = dwindow
    if wsub is None:
        wsub = max(tile, min(dwsub, window))
    on_tpu = (
        jax.default_backend() == "tpu"
        and D % 128 == 0
        and shard.dtype in (jnp.float32, jnp.bfloat16)
        and slots.ndim == 1
        and slots.shape[0] >= 4096
    )
    if not on_tpu:
        return jnp.take(shard, slots, axis=0, mode="clip")
    if (auto and choose_gather_kernel(density, shard.dtype, D) == "ring") or not (
        N >= window + _WALIGN and tile <= wsub <= window
    ):
        # low density (or tiny table): the descriptor-bound single-row ring
        # beats fetching mostly-unused windows; still exact.
        B = slots.shape[0]
        ids = jnp.clip(_pad_ids(slots.astype(jnp.int32), 1024), 0, N - 1)
        return gather_rows_pallas3(shard, ids).reshape(-1, D)[:B]
    return _local_take_sorted_vjp(shard, slots, tile, window, group, wsub)


def choose_gather_kernel(
    density: float, dtype, dim: int, *, desc_ns: float = 8.0, hbm_gbps: float = 819.0
) -> str:
    """Crossover heuristic: 'window' when the grouped windowed multi-row-DMA
    gather out-runs the descriptor-bound single-row ring for sorted ids of
    the given density, else 'ring'.  Pure host math — callers probe density
    once per batch structure (cf. the dedup heuristic in ops/gather.py).

    Efficiency factors are calibrated against the measured v5e ladder
    (d=0.95/0.8/0.6 f32 => 222/193/166 GB/s, /tmp/exp_lts_v3.log): the MXU
    select achieves ~0.25 of the naive bound (weight-reload-bound small-M
    matmuls: each sub-tile loads a fresh [wsub, dim] window slice), f32 on
    the 394 Tops s8 path (4 byte planes), bf16 on the 197 Tflops bf16 path
    (1 pass); the window fetch achieves ~0.85 of peak HBM."""
    itemsize = jnp.dtype(dtype).itemsize
    rowbytes = dim * itemsize
    ring_rows_s = 1e9 / desc_ns  # one row per descriptor
    tile, window, group, wsub = _window_plan(density, None, None, dim, itemsize)
    fetch_ratio = window / (tile * group)  # fetched rows per useful row
    fetch_rows_s = 0.85 * hbm_gbps * 1e9 / (fetch_ratio * rowbytes)
    if jnp.dtype(dtype) == jnp.float32:
        mxu_rows_s = 0.25 * 394e12 / (2 * wsub * dim * 4)
    else:
        mxu_rows_s = 0.25 * 197e12 / (2 * wsub * dim)
    window_rows_s = min(fetch_rows_s, mxu_rows_s)
    return "window" if window_rows_s > 1.15 * ring_rows_s else "ring"


# ---------------------------------------------------------------------------
# Masked host-memory row gather/scatter (the device_cached_host hot path)
# ---------------------------------------------------------------------------
#
# The reference's host-located tables are gathered directly by kernels over
# PCIe (memory_handle.cpp:530-577 shared-host mmap + gather_cached_func.cu);
# the TPU equivalent is a pallas DMA ring whose table memref lives in
# pltpu.MemorySpace.HOST.  Slots < 0 are SKIPPED (no DMA issued, output row
# is garbage — callers mask), so host-link traffic is proportional to the
# number of real fetches, not the padded buffer size.
#
# HOST-SPACE MOSAIC CONSTRAINTS (measured on v5e, scripts/exp_host_dma*.py):
# host memrefs are only usable FLAT (1-D); n-D host memrefs get the (8,128)
# tiling whose 512 B contiguous chunks trip an LLO 4 KB-granularity check
# ("multiplier_in_bytes % word_size"), and 1-D host memrefs are tiled in
# 4 KB pages (tiled<(1024)> for f32) with slices required to be
# tile-aligned.  So ALL host DMAs here move whole 4 KB pages at page-aligned
# offsets of a flat memref:
#   * rowbytes % 4096 == 0   -> a row IS k pages: direct row DMA.
#   * 4096 % rowbytes == 0   -> fetch the enclosing page, select the row on
#     device (PCIe amplification = rows_per_page); writes do a
#     fetch-merge-write page RMW with per-batch page dedup.
#   * otherwise (non-power-of-two rowbytes) the host tier is unsupported —
#     callers pad D (HostEmbedding raises a clear error).


def _masked_gather_kernel(ids_ref, table_ref, out_ref, sems, *, per_step, n_inflight):
    # 2-D grid + per_step sub-stepping: see _gather_kernel (the ids SMEM
    # block must equal XLA's s32 tile, never shrink it to bound the unroll)
    id_block = ids_ref.shape[0]
    base = pl.program_id(0) * id_block
    off = pl.program_id(1) * per_step

    def dma(j):
        idx = ids_ref[off + j]
        return pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[base + off + j], sems.at[j % n_inflight]
        )

    def issue(j, _):
        @pl.when(jnp.logical_and(j >= n_inflight, ids_ref[off + j - n_inflight] >= 0))
        def _wait():
            dma(j - n_inflight).wait()

        @pl.when(ids_ref[off + j] >= 0)
        def _start():
            dma(j).start()

        return 0

    lax.fori_loop(0, per_step, issue, 0, unroll=True)

    def drain(k, _):
        j = per_step - n_inflight + k

        @pl.when(jnp.logical_and(j >= 0, ids_ref[off + j] >= 0))
        def _w():
            dma(j).wait()

        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _masked_scatter_kernel(
    ids_ref, rows_ref, table_in_ref, out_ref, sems, *, per_step, n_inflight,
    ksub: int = 1,
):
    del table_in_ref  # aliased with out_ref
    id_block = ids_ref.shape[0]
    base = pl.program_id(0) * id_block
    off = pl.program_id(1) * per_step

    def valid(j):
        return ids_ref[(off + j) // ksub] >= 0

    def dma(j):
        g = off + j
        if ksub == 1:
            src, dst = base + g, ids_ref[g]
        else:
            r, s = g // ksub, g % ksub
            src = (base + r) * ksub + s
            dst = ids_ref[r] * ksub + s
        return pltpu.make_async_copy(
            rows_ref.at[src], out_ref.at[dst], sems.at[j % n_inflight]
        )

    def issue(j, _):
        @pl.when(jnp.logical_and(j >= n_inflight, valid(j - n_inflight)))
        def _wait():
            dma(j - n_inflight).wait()

        @pl.when(valid(j))
        def _start():
            dma(j).start()

        return 0

    lax.fori_loop(0, per_step, issue, 0, unroll=True)

    def drain(k, _):
        j = per_step - n_inflight + k

        @pl.when(jnp.logical_and(j >= 0, valid(j)))
        def _w():
            dma(j).wait()

        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _pad_ids(ids: Array, id_block: int) -> Array:
    B = ids.shape[0]
    pad = -B % id_block
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), -1, ids.dtype)])
    return ids


_HOST_PAGE = 4096  # bytes; Mosaic host-memref tile (see comment block above)


def host_layout(dim: int, dtype) -> tuple:
    """(chunk_elems, rows_per_page) for a host-located [N, dim] table, or
    (0, 0) if the dtype/dim cannot be mapped onto 4 KB host pages (callers
    must pad dim to a power-of-two row size)."""
    isz = jnp.dtype(dtype).itemsize
    rowbytes = dim * isz
    if rowbytes % _HOST_PAGE == 0:
        return dim, 1  # one DMA of k whole pages per row
    if _HOST_PAGE % rowbytes == 0:
        return _HOST_PAGE // isz, _HOST_PAGE // rowbytes
    return 0, 0


def _masked_ring(dma, ids_ref, id_block, n_inflight):
    """Shared issue/drain loop: start dma(j) for ids >= 0, keeping at most
    n_inflight outstanding."""

    def issue(j, _):
        @pl.when(jnp.logical_and(j >= n_inflight, ids_ref[j - n_inflight] >= 0))
        def _wait():
            dma(j - n_inflight).wait()

        @pl.when(ids_ref[j] >= 0)
        def _start():
            dma(j).start()

        return 0

    lax.fori_loop(0, id_block, issue, 0, unroll=True)

    def drain(k, _):
        j = id_block - n_inflight + k

        @pl.when(jnp.logical_and(j >= 0, ids_ref[j] >= 0))
        def _w():
            dma(j).wait()

        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _host_fetch_kernel(ids_ref, flat_ref, out_ref, sems, *, id_block, n_inflight, ce):
    """Masked DMA ring fetching ``ce``-element page-aligned chunks
    flat[ids[j]*ce : +ce] (HOST) into a flat device memref."""
    base = pl.program_id(0) * id_block

    def dma(j):
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(ids_ref[j] * ce, ce)],
            out_ref.at[pl.ds((base + j) * ce, ce)],
            sems.at[j % n_inflight],
        )

    _masked_ring(dma, ids_ref, id_block, n_inflight)


def _host_put_kernel(
    ids_ref, chunks_ref, flat_in_ref, out_ref, sems, *, id_block, n_inflight, ce
):
    """Masked DMA ring writing chunks[j] back to flat[ids[j]*ce : +ce]
    (HOST, aliased in/out)."""
    del flat_in_ref
    base = pl.program_id(0) * id_block

    def dma(j):
        return pltpu.make_async_copy(
            chunks_ref.at[pl.ds((base + j) * ce, ce)],
            out_ref.at[pl.ds(ids_ref[j] * ce, ce)],
            sems.at[j % n_inflight],
        )

    _masked_ring(dma, ids_ref, id_block, n_inflight)


def _host_fetch_chunks(
    flat: Array, ids: Array, ce: int, id_block: int, n_inflight: int
) -> Array:
    """[len(ids) * ce] flat fetch of chunks flat[ids[i]*ce : +ce] (ids < 0
    skipped -> garbage chunk).  flat lives in HOST space."""
    Bp = ids.shape[0]
    return pl.pallas_call(
        functools.partial(
            _host_fetch_kernel, id_block=id_block, n_inflight=n_inflight, ce=ce
        ),
        grid=(Bp // id_block,),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
        ],
        # out_shape MUST carry an explicit HBM space: with a plain
        # ShapeDtypeStruct the XLA-level custom call inherits the HOST space
        # from the pinned-host operand, and every downstream consumer then
        # needs a host->vmem fusion DMA ("Unimplemented DMA from host to
        # vmem" on v5e).  MemoryRef out_shape pins the result to HBM.
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=pltpu.MemorySpace.HBM((Bp * ce,), flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, flat)


def _host_put_chunks(
    flat: Array, ids: Array, chunks: Array, ce: int, id_block: int, n_inflight: int
) -> Array:
    """flat[ids[i]*ce : +ce] = chunks[i*ce : +ce] for ids >= 0; the host
    buffer is donated/aliased.  Duplicate non-negative ids are a data race —
    callers dedup."""
    Bp = ids.shape[0]
    return pl.pallas_call(
        functools.partial(
            _host_put_kernel, id_block=id_block, n_inflight=n_inflight, ce=ce
        ),
        grid=(Bp // id_block,),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # not VMEM (host DMA)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
        ],
        # plain ShapeDtypeStruct (NOT a HOST MemoryRef): the input-output
        # alias with the donated pinned-host buffer already carries the host
        # space; an explicit HOST annotation instead trips XLA's "returned
        # from the entry computation but the layout for this output is not
        # set to host memory" check
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0},
    )(ids, chunks, flat)


@functools.partial(jax.jit, static_argnames=("dim", "id_block", "n_inflight"))
def host_gather_rows(
    flat: Array,
    slots: Array,
    *,
    dim: int,
    id_block: int = 1024,
    n_inflight: int = 128,
) -> Array:
    """out[i] = flat-host-table row ``slots[i]`` (row r = flat[r*dim:+dim];
    slots < 0 -> garbage row, mask downstream).

    ``flat`` MUST be a flat pinned-host array — XLA cannot reshape
    host-space buffers inside a program ("bitcast changes dimensionality"),
    so host tables are stored flat by contract (HostEmbedding does).  Rows
    are moved as 4 KB pages (host_layout): whole-page rows DMA directly,
    sub-page rows fetch the enclosing page and select on device."""
    ce, rpp = host_layout(dim, flat.dtype)
    assert ce, (dim, flat.dtype)
    B = slots.shape[0]
    slots = _pad_ids(slots.astype(jnp.int32), id_block)
    Bp = slots.shape[0]
    if rpp == 1:
        out = _host_fetch_chunks(flat, slots, ce, id_block, n_inflight)
        return out.reshape(Bp, dim)[:B]
    pages = jnp.where(slots >= 0, slots // rpp, -1)
    out = _host_fetch_chunks(flat, pages, ce, id_block, n_inflight)
    out = out.reshape(Bp, rpp, dim)
    r = jnp.where(slots >= 0, slots % rpp, 0)
    return jnp.take_along_axis(out, r[:, None, None], axis=1)[:, 0][:B]


def _host_window_fetch_kernel(
    lo_ref, n_ref, flat_ref, out_ref, sems, *, ce, max_chunks, n_inflight,
    page_elems,
):
    """Fetch ``n_ref[0]`` contiguous ``ce``-element chunks starting at host
    element offset ``lo_ref[0]`` into a flat device buffer — the host link
    runs at its single-big-DMA rate (~14 GB/s v5e, exp_host_dma13) instead
    of the masked per-span ring's ~10.35 issue-bound rate."""

    def dma(j):
        # HOST memrefs carry a (4 KB page) element tiling; Mosaic must PROVE
        # dynamic slice offsets divisible by it (r4: unhinted offsets fail
        # to compile).  lo is page-aligned by the plan; ce % page == 0.
        off = pl.multiple_of(lo_ref[0] + j * ce, page_elems)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(off, ce)],
            out_ref.at[pl.ds(j * ce, ce)],
            sems.at[j % n_inflight],
        )

    n = n_ref[0]

    def issue(j, _):
        @pl.when(jnp.logical_and(j >= n_inflight, j - n_inflight < n))
        def _w():
            dma(j - n_inflight).wait()

        @pl.when(j < n)
        def _s():
            dma(j).start()

        return 0

    lax.fori_loop(0, max_chunks, issue, 0, unroll=True)

    def drain(k, _):
        j = max_chunks - n_inflight + k

        @pl.when(jnp.logical_and(j >= 0, j < n))
        def _w():
            dma(j).wait()

        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _host_window_plan(slots: Array, dim: int, page_elems: int, ce: int,
                      max_chunks: int, flat_len: int,
                      min_density: float = 0.0):
    """Window-mode host-fetch plan (pure jnp — CPU-testable).

    Returns (lo int32 element offset — aligned to lcm(dim, page) and
    clamped so every chunk stays inside ``flat_len``; nc int32 chunk count;
    rel [B] int32 row index into the fetched window in original slot order;
    infeasible bool — window exceeds ``max_chunks`` chunks, the table is
    smaller than one chunk span, or the requested rows are too SPARSE in
    their span (< ``min_density``, duplicates counted: they are served free
    by the take) for whole-window fetching to beat span coalescing)."""
    valid = slots >= 0
    big = jnp.int32(2**31 - 1)
    lo_row = jnp.min(jnp.where(valid, slots, big))
    hi_row = jnp.max(jnp.where(valid, slots, -1))
    any_valid = hi_row >= 0
    lo_row = jnp.where(any_valid, lo_row, 0)
    hi_row = jnp.where(any_valid, hi_row, 0)
    # int32 throughout: host tables honor the flat_len < 2**31 element
    # contract (HostEmbedding checks capacity*dim < 2**31)
    align = math.lcm(dim, page_elems)
    lo = lo_row * dim // align * align
    need = (hi_row + 1) * dim - lo
    nc = (need + ce - 1) // ce
    # nc_c*ce stays < 2**31 (nc_c <= max_chunks); raw nc*ce might not
    nc_c = jnp.minimum(nc, max_chunks)
    infeasible = (nc > max_chunks) | (nc_c * ce > flat_len)
    if min_density > 0:
        span_rows = hi_row - lo_row + 1
        infeasible |= (
            jnp.sum(valid).astype(jnp.float32)
            < span_rows.astype(jnp.float32) * min_density
        )
    # clamp lo down so lo + nc*ce <= flat_len (flat_len % align == 0 is the
    # caller's contract, so coverage of hi is preserved by the clamp)
    lo = jnp.clip(
        jnp.minimum(lo, (flat_len - nc_c * ce) // align * align), 0, None
    )
    rel = jnp.where(valid, slots - lo // dim, 0).astype(jnp.int32)
    return lo.astype(jnp.int32), nc_c.astype(jnp.int32), rel, infeasible


@functools.partial(
    jax.jit,
    static_argnames=(
        "dim", "chunk_mb", "max_window_mb", "n_inflight", "min_density",
    ),
)
def host_gather_rows_window(
    flat: Array,
    slots: Array,
    *,
    dim: int,
    chunk_mb: int = 16,
    max_window_mb: int = 1024,
    n_inflight: int = 4,
    min_density: float = 0.5,
) -> Array:
    """Window-mode host gather: fetch the whole contiguous [min, max] slot
    range with a few BIG chunked host DMAs (~14 GB/s on v5e — the host
    link's single-DMA rate, vs ~10.35 for the masked per-span issue ring,
    exp_host_dma12/13), then take the requested rows on device.  EXACT for
    any slots; profitable when they are DENSE in their span (window bytes =
    span x rowbytes regardless of batch size).  Spans beyond
    ``max_window_mb`` fall back wholesale to the span-coalescing gather
    (which itself falls back to the per-row ring) under a lax.cond —
    exactness never depends on clustering.

    slots < 0 -> garbage row (mask downstream), same contract as
    :func:`host_gather_rows`.
    """
    isz = jnp.dtype(flat.dtype).itemsize
    page_elems = _HOST_PAGE // isz
    ce = chunk_mb * (1 << 20) // isz
    assert ce % page_elems == 0
    max_chunks = max_window_mb // chunk_mb
    align = math.lcm(dim, page_elems)
    flat_len = flat.shape[0]
    # window-mode contract: ce % align == 0 makes (a) fetched.reshape(-1,
    # dim) legal (ce % dim == 0 so max_chunks*ce % dim == 0) and (b) the
    # end-of-table lo clamp coverage-preserving (lo and nc_c*ce both align-
    # multiples => the clamped window still covers (hi_row+1)*dim).  Row
    # sizes with lcm(dim, page) > ce (e.g. dim=3072 f32: align=3M > 16M? no,
    # but non-power-of-2 row bytes give align > ce) route to the span path.
    if (
        flat_len % align
        or ce % align
        or flat_len < ce
        or host_layout(dim, flat.dtype)[0] == 0
    ):
        # table layout outside the window contract: span path handles it
        return host_gather_rows_spans(flat, slots, dim=dim)
    slots = slots.astype(jnp.int32)
    lo, nc, rel, infeasible = _host_window_plan(
        slots, dim, page_elems, ce, max_chunks, flat_len,
        min_density=min_density,
    )

    def window_branch(_):
        fetched = pl.pallas_call(
            functools.partial(
                _host_window_fetch_kernel, ce=ce, max_chunks=max_chunks,
                n_inflight=n_inflight, page_elems=page_elems,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            # HBM MemoryRef out_shape: see _host_fetch_chunks
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=pltpu.MemorySpace.HBM((max_chunks * ce,), flat.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(lo.reshape(1), nc.reshape(1), flat)
        return jnp.take(fetched.reshape(-1, dim), rel, axis=0, mode="clip")

    def span_branch(_):
        return host_gather_rows_spans(flat, slots, dim=dim)

    return lax.cond(infeasible, span_branch, window_branch, None)


def _span_geometry(dim: int, itemsize: int, span_bytes: int = 32768) -> int:
    """Rows per coalesced host span: the largest span of ~span_bytes whose
    byte size is a whole number of 4 KB host pages (HOST-space DMA slices
    must be page-tiled).  Requires host_layout-compatible row sizes."""
    rowbytes = dim * itemsize
    span_rows = max(1, span_bytes // rowbytes)
    assert (span_rows * rowbytes) % _HOST_PAGE == 0, (dim, itemsize)
    return span_rows


def _span_plan(slots: Array, span_rows: int, max_spans: int):
    """Host-span coalescing plan (pure jnp — CPU-testable): sort the slots,
    group them by aligned ``span_rows``-row spans, compact the first
    occurrence of each span into a fetch list of static size ``max_spans``.

    Returns (fetch_ids [max_spans] int32 span ids or -1, idx_orig [B] row
    index into the fetched [max_spans*span_rows, dim] buffer in ORIGINAL
    slot order, overflow bool scalar — True when the batch touches more
    than max_spans distinct spans and the caller must fall back)."""
    B = slots.shape[0]
    valid = slots >= 0
    key = jnp.where(valid, slots, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)  # invalid slots sort last
    s_sorted = key[order]
    v_sorted = valid[order]
    span = jnp.where(v_sorted, s_sorted // span_rows, -1)
    first = v_sorted & jnp.concatenate(
        [jnp.ones((1,), bool), span[1:] != span[:-1]]
    )
    n_spans = jnp.sum(first)
    overflow = n_spans > max_spans
    fpos = jnp.nonzero(first, size=max_spans, fill_value=B)[0]
    fetch_ids = jnp.where(
        fpos < B, jnp.take(span, jnp.minimum(fpos, B - 1)), -1
    ).astype(jnp.int32)
    seg = jnp.clip(jnp.cumsum(first) - 1, 0, max_spans - 1)
    idx = seg * span_rows + jnp.where(v_sorted, s_sorted % span_rows, 0)
    idx_orig = jnp.zeros((B,), jnp.int32).at[order].set(idx.astype(jnp.int32))
    return fetch_ids, idx_orig, overflow


@functools.partial(
    jax.jit,
    static_argnames=("dim", "span_rows", "max_spans", "id_block", "n_inflight"),
)
def host_gather_rows_spans(
    flat: Array,
    slots: Array,
    *,
    dim: int,
    span_rows: int = 0,
    max_spans: int = 0,
    id_block: int = 1024,
    n_inflight: int = 128,
) -> Array:
    """Span-coalesced host gather: EXACT for any slots, fast when they are
    CLUSTERED (dense deduped batches).  Sorts the slots, merges them into
    aligned multi-page spans (~32 KB default) and fetches each needed span
    with ONE host DMA — the host link is descriptor-latency-bound
    (~16-25 us per descriptor regardless of 4-32 KB size), so clustered
    batches move up to span_rows x more bytes per descriptor.  When the
    batch touches more than ``max_spans`` distinct spans (scattered slots:
    coalescing cannot help) a lax.cond falls back WHOLESALE to the per-row
    ring — exactness never depends on clustering.

    Reference analog: the sorted-indices host-memory gather path added
    specifically to coalesce PCIe access (gather_op.cpp:118-120 +
    sort_indices_func.cu).

    slots < 0 -> garbage row (mask downstream), same contract as
    :func:`host_gather_rows`.
    """
    isz = jnp.dtype(flat.dtype).itemsize
    ce, rpp = host_layout(dim, flat.dtype)
    assert ce, (dim, flat.dtype)
    if span_rows == 0:
        span_rows = _span_geometry(dim, isz)
    B = slots.shape[0]
    if max_spans == 0:
        # sized for >=50% in-span density; scattered batches overflow into
        # the per-row fallback instead of bloating the staging buffer
        max_spans = min(B, 2 * -(-B // span_rows))
    # fetch-ring block must equal XLA's 1-D s32 tile T(min(1024, len)):
    # pad the span list to a power of two (<1024) or a 1024 multiple
    if max_spans >= 1024:
        max_spans = -(-max_spans // 1024) * 1024
        span_blk = 1024
    else:
        span_blk = 1 << (max_spans - 1).bit_length()
        max_spans = span_blk
    slots = slots.astype(jnp.int32)
    fetch_ids, idx_orig, overflow = _span_plan(slots, span_rows, max_spans)

    def span_branch(_):
        fetched = _host_fetch_chunks(
            flat, fetch_ids, span_rows * dim, span_blk, n_inflight
        )
        f2 = fetched.reshape(max_spans * span_rows, dim)
        return jnp.take(f2, idx_orig, axis=0, mode="clip")

    def row_branch(_):
        return host_gather_rows(
            flat, slots, dim=dim, id_block=id_block, n_inflight=n_inflight
        )

    return lax.cond(overflow, row_branch, span_branch, None)


@functools.partial(
    jax.jit,
    static_argnames=("dim", "id_block", "n_inflight"),
    donate_argnums=(0,),
)
def host_scatter_rows(
    flat: Array,
    slots: Array,
    rows: Array,
    *,
    dim: int,
    id_block: int = 1024,
    n_inflight: int = 128,
) -> Array:
    """flat-host-table row ``slots[i]`` = rows[i] (slots < 0 skipped); the
    flat pinned-host buffer is donated and updated in place.

    Sub-page rows go through a page fetch-merge-write RMW with per-batch
    page dedup, so the non-negative slots must be UNIQUE (duplicates within
    one page would race; the embedding paths dedup before applying)."""
    ce, rpp = host_layout(dim, flat.dtype)
    assert ce, (dim, flat.dtype)
    B = slots.shape[0]
    assert rows.shape == (B, dim), (rows.shape, B, dim)
    slots = _pad_ids(slots.astype(jnp.int32), id_block)
    Bp = slots.shape[0]
    if Bp != B:
        rows = jnp.concatenate([rows, jnp.zeros((Bp - B, dim), rows.dtype)])
    if rpp == 1:
        return _host_put_chunks(
            flat, slots, rows.reshape(-1).astype(flat.dtype), ce, id_block, n_inflight
        )
    valid = slots >= 0
    pg = jnp.where(valid, slots // rpp, jnp.int32(2**31 - 1))
    order = jnp.argsort(pg)  # invalid slots sort last
    pg_s = pg[order]
    r_s = jnp.where(valid[order], slots[order] % rpp, 0)
    rows_s = rows[order].astype(flat.dtype)
    valid_s = valid[order]
    first = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), pg_s[1:] != pg_s[:-1]]
    )
    seg = jnp.cumsum(first) - 1  # position -> dedup-page index
    fetch_ids = jnp.where(first, pg_s, -1)
    old = _host_fetch_chunks(flat, fetch_ids, ce, id_block, n_inflight)
    old = old.reshape(Bp, rpp, dim)
    # merge every written row of a page into its first occurrence's copy
    tgt = jnp.where(valid_s, seg * rpp + r_s, Bp * rpp)
    written = (
        jnp.zeros((Bp * rpp, dim), flat.dtype).at[tgt].set(rows_s, mode="drop")
    )
    wmask = jnp.zeros((Bp * rpp,), bool).at[tgt].set(valid_s, mode="drop")
    merged = jnp.where(
        wmask.reshape(Bp, rpp)[seg][:, :, None],
        written.reshape(Bp, rpp, dim)[seg],
        old,
    )
    return _host_put_chunks(
        flat, fetch_ids, merged.reshape(-1), ce, id_block, n_inflight
    )


@functools.partial(
    jax.jit, static_argnames=("id_block", "n_inflight", "per_step")
)
def gather_rows_masked(
    table: Array,
    slots: Array,
    *,
    id_block: int = 1024,
    n_inflight: int = 128,
    per_step: int | None = None,
) -> Array:
    """out[i] = table[slots[i]] for slots >= 0 (GARBAGE rows where slot < 0 —
    mask downstream).  HBM tables only; the pinned-host
    (device_cached_host cold-fetch) analog is :func:`host_gather_rows` on a
    FLAT host buffer (host memrefs cannot be reshaped in-program)."""
    B = slots.shape[0]
    N, D = table.shape
    assert D % 128 == 0, D
    slots = _pad_ids(slots.astype(jnp.int32), id_block)
    Bp = slots.shape[0]
    table_space = pltpu.ANY
    per_step, nsteps = _ring_steps(id_block, 1, per_step)
    n_inflight = min(n_inflight, per_step)
    out3 = pl.pallas_call(
        functools.partial(
            _masked_gather_kernel, per_step=per_step, n_inflight=n_inflight
        ),
        grid=(Bp // id_block, nsteps),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i, s: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=table_space),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, D // 128, 128), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slots, table.reshape(N, D // 128, 128))
    return out3.reshape(Bp, D)[:B]


@functools.partial(
    jax.jit,
    static_argnames=("id_block", "n_inflight", "split", "per_step"),
    donate_argnums=(0,),
)
def scatter_rows_masked3(
    table3: Array,
    slots: Array,
    rows3: Array,
    *,
    id_block: int = 1024,
    n_inflight: int = 128,
    split: int | None = None,
    per_step: int | None = None,
) -> Array:
    """Native-tile-layout masked scatter: table3[slots[i]] = rows3[i] for
    slots >= 0 (slot < 0 skipped), both in the kernel's ``[., D//128, 128]``
    layout; the table3 buffer is donated and updated in place (the loop-carry
    form — see :func:`scatter_rows_pallas3` for why).  split: wide-row
    sub-DMA count (auto; 1 disables)."""
    B = slots.shape[0]
    orig_shape = table3.shape
    P = table3.shape[1]
    assert rows3.shape[1:] == table3.shape[1:], (rows3.shape, table3.shape)
    slots = _pad_ids(slots.astype(jnp.int32), id_block)
    Bp = slots.shape[0]
    if Bp != B:
        rows3 = jnp.concatenate(
            [rows3, jnp.zeros((Bp - B, *rows3.shape[1:]), rows3.dtype)]
        )
    ksub = (
        _wide_row_split(P, jnp.dtype(table3.dtype).itemsize)
        if split is None
        else split
    )
    if ksub > 1:
        assert P % ksub == 0, (P, ksub)
        table3 = table3.reshape(table3.shape[0] * ksub, P // ksub, 128)
        rows3 = rows3.reshape(Bp * ksub, P // ksub, 128)
    per_step, nsteps = _ring_steps(id_block, ksub, per_step)
    n_inflight = min(n_inflight, per_step)
    out = pl.pallas_call(
        functools.partial(
            _masked_scatter_kernel, per_step=per_step, n_inflight=n_inflight,
            ksub=ksub,
        ),
        grid=(Bp // id_block, nsteps),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i, s: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(table3.shape, table3.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0},
    )(slots, rows3, table3)
    return out.reshape(orig_shape) if ksub > 1 else out


@functools.partial(
    jax.jit,
    static_argnames=("id_block", "n_inflight"),
    donate_argnums=(0,),
)
def scatter_rows_masked(
    table: Array,
    slots: Array,
    rows: Array,
    *,
    id_block: int = 1024,
    n_inflight: int = 128,
) -> Array:
    """table[slots[i]] = rows[i] for slots >= 0 (slot < 0 skipped); the table
    buffer is donated and updated in place.  HBM tables only; the pinned-host
    writeback analog is :func:`host_scatter_rows` on a FLAT host buffer.
    Flat [N, D] in/out; loop-carried tables should use
    :func:`scatter_rows_masked3` (relayout cost)."""
    B = slots.shape[0]
    N, D = table.shape
    assert D % 128 == 0 and rows.shape == (B, D)
    out3 = scatter_rows_masked3(
        table.reshape(N, D // 128, 128),
        slots,
        rows.reshape(B, D // 128, 128),
        id_block=id_block,
        n_inflight=n_inflight,
    )
    return out3.reshape(N, D)

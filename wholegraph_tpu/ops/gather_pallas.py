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

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, id_block: int, n_inflight: int):
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[idx],
            out_ref.at[base + j],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _wait():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, id_block, issue, 0, unroll=True)

    def drain(k, _):
        dma(id_block - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def _scatter_kernel(
    ids_ref, rows_ref, table_in_ref, out_ref, sems, *, id_block: int, n_inflight: int
):
    # out_ref aliases the donated table buffer (input_output_aliases);
    # table_in_ref is the same memory and is not read.
    del table_in_ref
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        return pltpu.make_async_copy(
            rows_ref.at[base + j],
            out_ref.at[idx],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _wait():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, id_block, issue, 0, unroll=True)

    def drain(k, _):
        dma(id_block - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("id_block", "n_inflight"), donate_argnums=(0,))
def scatter_rows_pallas(
    table: Array, ids: Array, rows: Array, *, id_block: int = 1024, n_inflight: int = 256
) -> Array:
    """table[ids[i]] = rows[i] via pipelined row DMAs (duplicate ids: winner
    unspecified, same caveat as the reference scatter).  The table buffer is
    donated and updated in place."""
    B = ids.shape[0]
    N, D = table.shape
    assert D % 128 == 0 and B % id_block == 0
    assert rows.shape == (B, D)
    ids = ids.astype(jnp.int32)
    out3 = pl.pallas_call(
        functools.partial(_scatter_kernel, id_block=id_block, n_inflight=n_inflight),
        grid=(B // id_block,),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, D // 128, 128), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0},  # donated table buffer IS the output
    )(ids, rows.reshape(B, D // 128, 128), table.reshape(N, D // 128, 128))
    return out3.reshape(N, D)


@functools.partial(jax.jit, static_argnames=("id_block", "n_inflight"))
def _gather_rows_pallas3_impl(
    table: Array, ids: Array, *, id_block: int = 1024, n_inflight: int = 256
) -> Array:
    """out[i] = table[ids[i]] via pipelined row DMAs, returned in the
    kernel's native tile layout ``[B, D//128, 128]`` (avoids the ~25% cost
    of relaying out to a flat [B, D] minor layout; callers that feed a
    reduction can keep the 3-D form).

    table: [N, D] with D a multiple of 128; ids: [B] int32, B a multiple of
    id_block.
    """
    B = ids.shape[0]
    N, D = table.shape
    assert D % 128 == 0, f"dim {D} must be a multiple of 128"
    assert B % id_block == 0, (B, id_block)
    ids = ids.astype(jnp.int32)
    grid = (B // id_block,)
    return pl.pallas_call(
        functools.partial(_gather_kernel, id_block=id_block, n_inflight=n_inflight),
        grid=grid,
        in_specs=[
            pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, D // 128, 128), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table.reshape(N, D // 128, 128))


@jax.custom_vjp
def gather_rows_pallas3(table: Array, ids: Array) -> Array:
    """Differentiable native-layout gather (default ring parameters);
    backward = scatter-add of the cotangent rows."""
    return _gather_rows_pallas3_impl(table, ids)


def _g3_fwd(table, ids):
    return _gather_rows_pallas3_impl(table, ids), (ids, table)


def _g3_bwd(res, ct):
    ids, table = res
    N, D = table.shape
    ct2 = ct.reshape(ct.shape[0], D)
    clipped = jnp.clip(ids, 0, N - 1)
    dtable = (
        jnp.zeros((N, D), ct2.dtype)
        .at[clipped]
        .add(ct2, mode="drop")
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
# f32 adds exactly one nonzero term => exact.  f32 tables: MXU multiplies via
# bf16 multi-pass; Precision.HIGHEST splits each f32 into >=3 disjoint bf16
# mantissa pieces, each multiplied by exactly 1.0 and summed in f32 — the
# pieces are disjoint bit-ranges of the 24-bit mantissa, so the sum
# reconstructs the original f32 exactly.  (Verified bit-exact on hardware in
# tests/test_pallas_tpu.py.)
#
# Ids outside a tile's window produce ZERO rows (the one-hot row is all
# zeros) — the same observable-miss contract as the masked kernels below; use
# window_coverage() to size the window or to detect misses.
#
# Crossover vs the DMA ring (v5e, rows of R bytes, sorted-id density d =
# rows-referenced / window-span):  ring = R / 8ns;  window = min(819 GB/s * d
# (HBM fetch), MXU one-hot rate).  At D=256 f32 (HIGHEST ~ 33 TFLOP/s,
# W=256: 131 KFLOP/row => 250 Mrow/s) the window path wins for d >~ 0.33;
# at D=256 bf16 (W=512: 262 KFLOP bf16 => ~750 Mrow/s) it wins for d >~ 0.1
# and peaks ~6x the ring.  choose_gather_kernel() encodes this.


_WALIGN = 32  # window starts aligned to HBM sublane tiling (8 f32 / 16 bf16)


def _window_gather_kernel(
    w0s_ref, ids_ref, table_ref, out_ref, win, sems, *, tile, window, nt
):
    t = pl.program_id(0)

    def copy(slot, tt):
        # w0s are _WALIGN-aligned by construction; tell Mosaic so the tiled
        # HBM slice is provably tile-aligned.
        w0 = pl.multiple_of(w0s_ref[tt], _WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0, window), :],
            win.at[slot],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _first():
        copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _prefetch():
        copy((t + 1) % 2, t + 1).start()

    slot = t % 2
    copy(slot, t).wait()

    ids = ids_ref[...]  # [tile, 1] int32
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
    dtype = out_ref.dtype
    onehot = (ids - w0s_ref[t] == col).astype(jnp.bfloat16)  # 0/1: exact

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if dtype == jnp.bfloat16:
        rows = bdot(onehot, win[slot])
    else:
        # bit-exact f32 select in 3 bf16 MXU passes: split each f32 into
        # three disjoint-mantissa bf16 pieces (24 = 3x8 bits); the one-hot
        # picks one element's pieces and their f32 sum reconstructs it
        # exactly (cheaper than Precision.HIGHEST's 6 passes, same result
        # because the one-hot operand needs no splitting).
        w = win[slot]
        hi = w.astype(jnp.bfloat16)
        r = w - hi.astype(jnp.float32)
        mid = r.astype(jnp.bfloat16)
        lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        rows = bdot(onehot, hi) + bdot(onehot, mid) + bdot(onehot, lo)
    out_ref[...] = rows.astype(dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def gather_rows_window(
    table: Array, ids: Array, *, tile: int = 256, window: int = 1024
) -> Array:
    """out[i] = table[ids[i]] for SORTED ids via windowed multi-row DMAs.

    Per tile of ``tile`` consecutive ids, one DMA fetches the ``window`` table
    rows starting at that tile's first id (aligned down to the HBM sublane
    tiling); rows are selected by a bit-exact MXU one-hot matmul.  Ids falling
    outside their tile's window return ZERO rows (use :func:`window_coverage`
    to check).  Requires ``window <= N``.

    Float dtypes only (f32 exact via Precision.HIGHEST; bf16 exact natively).
    """
    B = ids.shape[0]
    N, D = table.shape
    assert D % 128 == 0, D
    assert window % _WALIGN == 0, window
    assert N >= window + _WALIGN, (N, window)
    assert table.dtype in (jnp.float32, jnp.bfloat16), table.dtype
    ids = ids.astype(jnp.int32)
    pad = -B % tile
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), N, jnp.int32)])
    Bp = ids.shape[0]
    nt = Bp // tile
    nmax = (N - window) // _WALIGN * _WALIGN
    w0s = jnp.clip(ids[::tile] // _WALIGN * _WALIGN, 0, nmax)
    out = pl.pallas_call(
        functools.partial(
            _window_gather_kernel, tile=tile, window=window, nt=nt
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # w0s, whole
            pl.BlockSpec((tile, 1), lambda t: (t, 0)),  # ids column, pipelined
            pl.BlockSpec(memory_space=pltpu.ANY),  # table, HBM
        ],
        out_specs=pl.BlockSpec((tile, D), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, D), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, window, D), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, ids.reshape(Bp, 1), table)
    return out[:B]


def window_coverage(
    ids: Array, n_rows: int, *, tile: int = 256, window: int = 1024
):
    """For sorted ids, the fraction of ids that fall inside their tile's
    window (rows gather_rows_window would return non-zero; mirrors the
    kernel's aligned+clamped window starts exactly) and the sorted-id density
    (distinct-rows / span) that drives the ring-vs-window crossover.
    Returns (covered_fraction, density), both device scalars."""
    B = ids.shape[0]
    pad = -B % tile
    idp = ids.astype(jnp.int32)
    if pad:
        idp = jnp.concatenate([idp, jnp.broadcast_to(idp[-1:], (pad,))])
    tiles = idp.reshape(-1, tile)
    nmax = (n_rows - window) // _WALIGN * _WALIGN
    w0 = jnp.clip(tiles[:, :1] // _WALIGN * _WALIGN, 0, nmax)
    off = tiles - w0
    covered = ((off >= 0) & (off < window)).sum() - pad
    span = jnp.maximum(idp[-1] - idp[0] + 1, 1)
    distinct = 1 + (idp[1:] != idp[:-1]).sum()
    return covered / B, distinct / span


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def _local_take_sorted_impl(
    shard: Array, slots: Array, *, tile: int, window: int
) -> Array:
    N, D = shard.shape
    B = slots.shape[0]
    slots = jnp.clip(slots.astype(jnp.int32), 0, N - 1)
    out = gather_rows_window(shard, slots, tile=tile, window=window)
    # repair pass: ids outside their tile's window re-fetched by the masked
    # single-row DMA ring.  lax.cond => the repair kernel only RUNS on
    # batches that actually have a miss, so well-windowed batches pay one
    # any() reduce and nothing else.
    pad = -B % tile
    padded = (
        jnp.concatenate([slots, jnp.full((pad,), N, jnp.int32)]) if pad else slots
    )
    nmax = (N - window) // _WALIGN * _WALIGN
    w0 = jnp.clip(
        padded.reshape(-1, tile)[:, :1] // _WALIGN * _WALIGN, 0, nmax
    )
    off = padded.reshape(-1, tile) - w0
    miss = ((off < 0) | (off >= window)).reshape(-1)[:B]

    def repair(o):
        fix = gather_rows_masked(shard, jnp.where(miss, slots, -1))
        return jnp.where(miss[:, None], fix, o)

    return lax.cond(jnp.any(miss), repair, lambda o: o, out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _local_take_sorted_vjp(shard, slots, tile, window):
    return _local_take_sorted_impl(shard, slots, tile=tile, window=window)


def _lts_fwd(shard, slots, tile, window):
    return _local_take_sorted_vjp(shard, slots, tile, window), (slots, shard)


def _lts_bwd(tile, window, res, ct):
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


def local_take_sorted(
    shard: Array,
    slots: Array,
    *,
    tile: int = 256,
    window: int | None = None,
    density: float = 1.0,
) -> Array:
    """Exact local gather for (mostly) SORTED slots: the windowed multi-row
    DMA + MXU one-hot kernel for in-window rows, plus a masked single-row
    repair pass (run only when a miss occurs) — always exact, fastest when
    sorted-id density is high (dense deduped batches; see
    choose_gather_kernel).  ``density`` (expected distinct-rows/span) sizes
    the default window so misses stay rare.

    Falls back to the general path for dtypes/shapes the window kernel does
    not support.  Reference analog: the sorted/unique indices fast path of
    gather_op.cpp:118-120 + sort_unique_indices_func.cu.
    """
    N, D = shard.shape
    if window is None:
        span = int(tile / max(min(density, 1.0), 0.05))
        window = -(-span // _WALIGN) * _WALIGN + 2 * _WALIGN
    usable = (
        jax.default_backend() == "tpu"
        and D % 128 == 0
        and shard.dtype in (jnp.float32, jnp.bfloat16)
        and slots.ndim == 1
        and slots.shape[0] >= 4096
        and N >= window + _WALIGN
    )
    if not usable:
        return jnp.take(shard, slots, axis=0, mode="clip")
    return _local_take_sorted_vjp(shard, slots, tile, window)


def choose_gather_kernel(
    density: float, dtype, dim: int, *, desc_ns: float = 8.0, hbm_gbps: float = 819.0
) -> str:
    """Crossover heuristic: 'window' when the windowed multi-row-DMA gather
    out-runs the descriptor-bound single-row ring for sorted ids of the given
    density, else 'ring'.  Pure host math — callers probe density once per
    batch structure (cf. the dedup heuristic in ops/gather.py)."""
    rowbytes = dim * jnp.dtype(dtype).itemsize
    ring_rows_s = 1e9 / desc_ns  # one row per descriptor
    tile = 256
    d = max(min(density, 1.0), 0.05)
    window = -(-int(tile / d) // _WALIGN) * _WALIGN + 2 * _WALIGN
    fetch_rows_s = hbm_gbps * 1e9 / (window / tile * rowbytes)
    flops_per_row = 2 * window * dim
    mxu = 197e12 / 6 if jnp.dtype(dtype) == jnp.float32 else 197e12
    window_rows_s = min(fetch_rows_s, mxu / flops_per_row)
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


def _masked_gather_kernel(ids_ref, table_ref, out_ref, sems, *, id_block, n_inflight):
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[base + j], sems.at[j % n_inflight]
        )

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


def _masked_scatter_kernel(
    ids_ref, rows_ref, table_in_ref, out_ref, sems, *, id_block, n_inflight
):
    del table_in_ref  # aliased with out_ref
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        return pltpu.make_async_copy(
            rows_ref.at[base + j], out_ref.at[idx], sems.at[j % n_inflight]
        )

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


def _pad_ids(ids: Array, id_block: int) -> Array:
    B = ids.shape[0]
    pad = -B % id_block
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), -1, ids.dtype)])
    return ids


@functools.partial(
    jax.jit, static_argnames=("id_block", "n_inflight", "host_table")
)
def gather_rows_masked(
    table: Array,
    slots: Array,
    *,
    id_block: int = 1024,
    n_inflight: int = 128,
    host_table: bool = False,
) -> Array:
    """out[i] = table[slots[i]] for slots >= 0 (GARBAGE rows where slot < 0 —
    mask downstream).  ``host_table=True`` reads the table from
    pltpu.MemorySpace.HOST (pinned host memory over PCIe) — the
    device_cached_host cold-fetch path."""
    B = slots.shape[0]
    N, D = table.shape
    assert D % 128 == 0, D
    slots = _pad_ids(slots.astype(jnp.int32), id_block)
    Bp = slots.shape[0]
    table_space = pltpu.MemorySpace.HOST if host_table else pltpu.ANY
    out3 = pl.pallas_call(
        functools.partial(
            _masked_gather_kernel, id_block=id_block, n_inflight=n_inflight
        ),
        grid=(Bp // id_block,),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
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
    static_argnames=("id_block", "n_inflight", "host_table"),
    donate_argnums=(0,),
)
def scatter_rows_masked(
    table: Array,
    slots: Array,
    rows: Array,
    *,
    id_block: int = 1024,
    n_inflight: int = 128,
    host_table: bool = False,
) -> Array:
    """table[slots[i]] = rows[i] for slots >= 0 (slot < 0 skipped); the table
    buffer is donated and updated in place.  ``host_table=True`` writes back
    to pinned host memory (the trainable host-tier writeback)."""
    B = slots.shape[0]
    N, D = table.shape
    assert D % 128 == 0 and rows.shape == (B, D)
    slots = _pad_ids(slots.astype(jnp.int32), id_block)
    Bp = slots.shape[0]
    if Bp != B:
        rows = jnp.concatenate([rows, jnp.zeros((Bp - B, D), rows.dtype)])
    table_space = pltpu.MemorySpace.HOST if host_table else pltpu.ANY
    out3 = pl.pallas_call(
        functools.partial(
            _masked_scatter_kernel, id_block=id_block, n_inflight=n_inflight
        ),
        grid=(Bp // id_block,),
        in_specs=[
            pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=table_space),
        ],
        out_specs=pl.BlockSpec(memory_space=table_space),
        out_shape=jax.ShapeDtypeStruct((N, D // 128, 128), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={2: 0},
    )(slots, rows.reshape(Bp, D // 128, 128), table.reshape(N, D // 128, 128))
    return out3.reshape(N, D)

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

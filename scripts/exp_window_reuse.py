"""Round-4 window-select ladder (VERDICT r3 item 2): attack the MXU
weight-reload / VPU plane-extraction costs of the sorted windowed gather.

Variants at the bench config (d=0.8, D=256 f32, B=512K, N=4M):

  V0   baseline gather_rows_window kw(tile=128, group=8, window=1408, wsub=224)
  V0b  wsub=256 (K already pads to 2 MXU tiles -> should be free slack)
  V3a  tile=256 group=4 (same step, 2x M per weight load, wsub 416)
  V3b  tile=256 group=8 window=2688 wsub=416 (2x step)
  V2a  PLANE-LAYOUT table ([N, 4D] int8, plane-major, bias ^0x80 pre-applied):
       4 separate [wsub, D] plane matmuls, zero in-kernel extraction
  V2b  plane layout, ONE [tile, wsub] @ [wsub, 4D] packed matmul
  V2c  V2a x tile=256 group=4
  DIAG fetch-only (DMA, no select) and select-only (no DMA) at V0 kw

Run detached on hardware:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_window_reuse.py > /tmp/exp_reuse.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wholegraph_tpu.ops.gather_pallas import (
    _WALIGN,
    _window_starts,
    gather_rows_window,
)
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 6


def make_plane_table(table, chunk=1 << 16):
    """[N, D] f32 -> [N, 4D] int8 plane-major, bias folded in (p - 128).

    Chunked scan: u8 temps expand to u32 on TPU, so a whole-table transpose
    materializes 4x the table (OOM at N=4M).  Planes are extracted with
    int32 shifts per chunk instead."""
    n, d = table.shape
    if n % chunk:
        chunk = next(c for c in range(chunk, 0, -1) if n % c == 0)

    def one(x):  # [chunk, D] f32 -> [chunk, 4D] int8 plane-major, biased
        w = lax.bitcast_convert_type(x, jnp.int32)
        return jnp.concatenate(
            [(((w >> (8 * k)) & 0xFF) - 128).astype(jnp.int8) for k in range(4)],
            axis=1,
        )

    def body(_, i):
        return None, one(lax.dynamic_slice(table, (i * chunk, 0), (chunk, d)))

    _, out = lax.scan(body, None, jnp.arange(n // chunk))
    return out.reshape(n, 4 * d)


def _plane_kernel(
    w0s_ref, starts_ref, ids_ref, table_ref, out_ref, win, sems,
    *, tile, wsub, group, window, nt, packed, mode="full",
):
    t = pl.program_id(0)

    def copy(slot, tt):
        w0 = pl.multiple_of(w0s_ref[tt], _WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0, window), :], win.at[slot], sems.at[slot]
        )

    do_dma = mode != "select_only"  # select_only: reuse stale scratch, no DMA
    if do_dma:
        @pl.when(t == 0)
        def _first():
            copy(0, 0).start()

        @pl.when(t + 1 < nt)
        def _prefetch():
            copy((t + 1) % 2, t + 1).start()

    slot = t % 2
    if do_dma:
        copy(slot, t).wait()
    w0 = w0s_ref[t]

    def idot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    D_out = out_ref.shape[-1]
    if mode == "fetch_only":
        # DMA is a real side effect (waited above); skip all compute
        out_ref[...] = jnp.zeros_like(out_ref)
        return
    for g in range(group):
        base = g * tile
        s_g = pl.multiple_of(starts_ref[t * group + g], _WALIGN)
        ids_g = ids_ref[base:base + tile, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, wsub), 1)
        match = ids_g - (w0 + s_g) == col
        oh8 = match.astype(jnp.int8)
        hit = match.any(axis=1, keepdims=True)
        bias = jnp.where(hit, 128, 0)
        if packed:
            wsl = win[slot, pl.ds(s_g, wsub), :]  # [wsub, 4D] int8
            sel_all = idot(oh8, wsl)
            acc = jnp.zeros((tile, D_out), jnp.int32)
            for k in range(4):
                sel = sel_all[:, k * D_out:(k + 1) * D_out] + bias
                acc = acc | ((sel & 0xFF) << (8 * k))
        else:
            acc = jnp.zeros((tile, D_out), jnp.int32)
            for k in range(4):
                plane = win[slot, pl.ds(s_g, wsub), k * D_out:(k + 1) * D_out]
                sel = idot(oh8, plane) + bias
                acc = acc | ((sel & 0xFF) << (8 * k))
        out_ref[base:base + tile, :] = lax.bitcast_convert_type(acc, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("tile", "window", "group", "wsub", "packed", "mode")
)
def gather_rows_window_planes(
    planes, ids, *, tile=128, window=1408, group=8, wsub=224, packed=False,
    mode="full",
):
    Bn = ids.shape[0]
    n, d4 = planes.shape
    D_out = d4 // 4
    step = tile * group
    ids = ids.astype(jnp.int32)
    pad = -Bn % step
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), n, jnp.int32)])
    Bp = ids.shape[0]
    nt = Bp // step
    w0s, starts = _window_starts(ids, n, tile, window, group, wsub)
    out = pl.pallas_call(
        functools.partial(
            _plane_kernel, tile=tile, wsub=wsub, group=group, window=window,
            nt=nt, packed=packed, mode=mode,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((step, 1), lambda t: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((step, D_out), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, D_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, window, d4), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, starts, ids.reshape(Bp, 1), planes)
    return out[:Bn]


def bw(dt):
    return B * D * 4 / dt / 1e9


def run(tag, fn, *args):
    try:
        dts = sorted(measure_chain(fn, iters, *args) for _ in range(3))
        print(
            f"{tag}: {bw(dts[1]):.1f} GB/s "
            f"[{', '.join(f'{x*1e3:.2f}' for x in dts)} ms]",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (N, D), jnp.float32)
    )()
    planes = jax.jit(make_plane_table)(table)
    d = 0.8
    span = int(B / d)
    lists = [
        jnp.asarray(np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32))
        for b in rng.randint(0, N - span, size=6)
    ]

    # correctness of the plane path vs the baseline (bit-exact)
    ref = gather_rows_window(table, lists[0], tile=128, group=8, window=1408, wsub=224)
    for packed in (False, True):
        got = gather_rows_window_planes(planes, lists[0], packed=packed)
        print(f"planes packed={packed} bitequal: {bool(jnp.array_equal(ref, got))}",
              flush=True)

    def mk(fn, **kw):
        def step(i, tab):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fn(tab, ids, **kw)[0, 0]
        return step

    run("V0  base 128/8/1408/224", mk(gather_rows_window, tile=128, group=8,
        window=1408, wsub=224), table)
    run("V0b wsub=256", mk(gather_rows_window, tile=128, group=8,
        window=1408, wsub=256), table)
    run("V3a tile256 g4", mk(gather_rows_window, tile=256, group=4,
        window=1408, wsub=416), table)
    run("V3b tile256 g8 win2688", mk(gather_rows_window, tile=256, group=8,
        window=2688, wsub=416), table)
    run("V2a planes 4mm", mk(gather_rows_window_planes, packed=False), planes)
    run("V2b planes packed", mk(gather_rows_window_planes, packed=True), planes)
    run("V2c planes t256 g4 wsub416", mk(gather_rows_window_planes, tile=256,
        group=4, wsub=416, packed=False), planes)
    run("V2d planes t256 g4 wsub416 packed", mk(gather_rows_window_planes,
        tile=256, group=4, wsub=416, packed=True), planes)
    run("DIAG fetch-only planes", mk(gather_rows_window_planes, mode="fetch_only"),
        planes)
    run("DIAG select-only planes", mk(gather_rows_window_planes, mode="select_only"),
        planes)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 window ladder part 2: the r4 diagnostics showed the SELECT is
near-peak and fully overlapped (select-only 1.92 ms) while the WINDOW FETCH
dominates (fetch-only 2.37 ms = ~310 GB/s per-DMA effective — one slab DMA
at a time appears to ride ONE DMA engine).  Try: split each window fetch
into S parallel sub-slab DMAs (separate semaphores), deeper pipelines
(3 slots), and the same for the plain f32 kernel.

  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_window_reuse2.py > /tmp/exp_reuse2.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wholegraph_tpu.ops.gather_pallas import _WALIGN, _window_starts
from wholegraph_tpu.utils.perf import measure_chain
from exp_window_reuse import make_plane_table

N, D, B, iters = 4_000_000, 256, 1 << 19, 6


def _split_kernel(
    w0s_ref, starts_ref, ids_ref, table_ref, out_ref, win, sems,
    *, tile, wsub, group, window, nt, planes, splits, slots, mode="full",
):
    t = pl.program_id(0)
    sub = window // splits

    def copy(slot, tt, s):
        w0 = pl.multiple_of(w0s_ref[tt], _WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0 + s * sub, sub), :],
            win.at[slot, pl.ds(s * sub, sub), :],
            sems.at[slot, s],
        )

    def start_all(slot, tt):
        for s in range(splits):
            copy(slot, tt, s).start()

    @pl.when(t == 0)
    def _first():
        for la in range(slots - 1):
            start_all(la, la)

    @pl.when(t + slots - 1 < nt)
    def _prefetch():
        start_all((t + slots - 1) % slots, t + slots - 1)

    slot = t % slots
    for s in range(splits):
        copy(slot, t, s).wait()
    w0 = w0s_ref[t]

    def idot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    D_out = out_ref.shape[-1]
    if mode == "fetch_only":
        out_ref[...] = jnp.zeros_like(out_ref)
        return
    for g in range(group):
        base = g * tile
        s_g = pl.multiple_of(starts_ref[t * group + g], _WALIGN)
        ids_g = ids_ref[base:base + tile, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, wsub), 1)
        match = ids_g - (w0 + s_g) == col
        if not planes:
            # f32 window: in-kernel plane extraction (baseline select)
            oh8 = match.astype(jnp.int8)
            hit = match.any(axis=1, keepdims=True)
            wslice = win[slot, pl.ds(s_g, wsub), :]
            w_i32 = lax.bitcast_convert_type(wslice, jnp.int32)
            acc = jnp.zeros((tile, D_out), jnp.int32)
            for k in range(4):
                plane = (((w_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
                sel = idot(oh8, plane) + jnp.where(hit, 128, 0)
                acc = acc | ((sel & 0xFF) << (8 * k))
        else:
            oh8 = match.astype(jnp.int8)
            hit = match.any(axis=1, keepdims=True)
            bias = jnp.where(hit, 128, 0)
            acc = jnp.zeros((tile, D_out), jnp.int32)
            for k in range(4):
                plane = win[slot, pl.ds(s_g, wsub), k * D_out:(k + 1) * D_out]
                sel = idot(oh8, plane) + bias
                acc = acc | ((sel & 0xFF) << (8 * k))
        out_ref[base:base + tile, :] = lax.bitcast_convert_type(acc, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "window", "group", "wsub", "splits", "slots", "mode"),
)
def gather_split(
    table, ids, *, tile=128, window=1408, group=8, wsub=224, splits=4,
    slots=2, mode="full",
):
    Bn = ids.shape[0]
    n = table.shape[0]
    planes = table.dtype == jnp.int8
    D_out = table.shape[1] // 4 if planes else table.shape[1]
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
            _split_kernel, tile=tile, wsub=wsub, group=group, window=window,
            nt=nt, planes=planes, splits=splits, slots=slots, mode=mode,
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
            pltpu.VMEM((slots, window, table.shape[1]), table.dtype),
            pltpu.SemaphoreType.DMA((slots, splits)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, starts, ids.reshape(Bp, 1), table)
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

    ref = jnp.take(table, lists[0], axis=0)
    got = gather_split(planes, lists[0], splits=4)
    # miss rows are zero in the kernel: compare only hit rows
    eq = bool(
        jnp.all((got == ref) | (got == 0))
        and (jnp.mean((got == ref).all(axis=1).astype(jnp.float32)) > 0.999)
    )
    print(f"split-4 planes correctness (hits bit-equal): {eq}", flush=True)

    def mk(fn, **kw):
        def step(i, tab):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fn(tab, ids, **kw)[0, 0]
        return step

    for s in (2, 4, 8):
        run(f"planes split{s}", mk(gather_split, splits=s), planes)
    run("planes split4 slots3", mk(gather_split, splits=4, slots=3), planes)
    run("planes split8 slots3", mk(gather_split, splits=8, slots=3), planes)
    for s in (1, 4):
        run(f"DIAG fetch-only split{s}", mk(gather_split, splits=s,
            mode="fetch_only"), planes)
    run("DIAG fetch-only split8 slots3", mk(gather_split, splits=8, slots=3,
        mode="fetch_only"), planes)
    run("f32 split4", mk(gather_split, splits=4), table)
    run("f32 split8 slots3", mk(gather_split, splits=8, slots=3), table)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 window ladder part 5: is the 547 GB/s XLA r+w copy the machine's
aggregate HBM rate, or an XLA artifact?  reuse4 measured pure window READS
at ~HBM read peak and reuse2 measured the full kernel at ~500 GB/s
aggregate (fetch 738 MB + out write 537 MB in 2.54 ms) — if a pure-DMA r+w
copy rides substantially above 547, the kernel's OUT write (Mosaic's
pipelined out_specs) is the bottleneck and a manual out-DMA wins; if not,
the kernel is at machine SoL and the ceiling math goes to DESIGN.md.

  A. pallas DMA copy r+w: read [CH,D] slab HBM->VMEM, write VMEM->HBM,
     double buffered (pure DMA, no compute)
  B. same with split-4 sub-slab DMAs both directions
  C. gather f32 split4 with MANUAL out DMA (out in ANY space, VMEM acc
     staging, 2 out slots) at the bench config
  D. C with out-DMA split 4

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
    python scripts/exp_window_reuse5.py > /tmp/exp_reuse5.log 2>&1 &
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

N, D, B, iters = 4_000_000, 256, 1 << 19, 6


# --------------------------------------------------------------------- A/B
def _dma_copy_kernel(src_ref, dst_ref, buf, rsem, wsem, *, ch, nt, splits):
    t = pl.program_id(0)
    sub = ch // splits

    def rd(slot, tt, s):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(tt * ch + s * sub, sub), :],
            buf.at[slot, pl.ds(s * sub, sub), :], rsem.at[slot, s],
        )

    def wr(slot, tt, s):
        return pltpu.make_async_copy(
            buf.at[slot, pl.ds(s * sub, sub), :],
            dst_ref.at[pl.ds(tt * ch + s * sub, sub), :], wsem.at[slot, s],
        )

    @pl.when(t == 0)
    def _first():
        for s in range(splits):
            rd(0, 0, s).start()

    @pl.when(t + 1 < nt)
    def _pref():
        for s in range(splits):
            rd((t + 1) % 2, t + 1, s).start()

    slot = t % 2
    for s in range(splits):
        rd(slot, t, s).wait()

    @pl.when(t >= 2)
    def _wback():
        for s in range(splits):
            wr(slot, t - 2, s).wait()

    for s in range(splits):
        wr(slot, t, s).start()

    @pl.when(t == nt - 1)
    def _drain():
        for s in range(splits):
            wr(slot, t, s).wait()
            if nt > 1:
                wr((t - 1) % 2, t - 1, s).wait()


@functools.partial(jax.jit, static_argnames=("ch", "splits"))
def dma_copy(src, *, ch=4096, splits=1):
    n, d = src.shape
    nt = n // ch
    return pl.pallas_call(
        functools.partial(_dma_copy_kernel, ch=ch, nt=nt, splits=splits),
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, d), src.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ch, d), src.dtype),
            pltpu.SemaphoreType.DMA((2, splits)),
            pltpu.SemaphoreType.DMA((2, splits)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src)


# --------------------------------------------------------------------- C/D
def _manual_out_kernel(
    w0s_ref, starts_ref, ids_ref, table_ref, out_ref, win, acc_buf,
    rsems, osems, *, tile, wsub, group, window, nt, splits, osplits,
):
    t = pl.program_id(0)
    step = tile * group
    sub = window // splits
    osub = step // osplits

    def rd(slot, tt, s):
        w0 = pl.multiple_of(w0s_ref[tt], _WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0 + s * sub, sub), :],
            win.at[slot, pl.ds(s * sub, sub), :], rsems.at[slot, s],
        )

    def wr(slot, tt, s):
        return pltpu.make_async_copy(
            acc_buf.at[slot, pl.ds(s * osub, osub), :],
            out_ref.at[pl.ds(tt * step + s * osub, osub), :],
            osems.at[slot, s],
        )

    @pl.when(t == 0)
    def _first():
        for s in range(splits):
            rd(0, 0, s).start()

    @pl.when(t + 1 < nt)
    def _pref():
        for s in range(splits):
            rd((t + 1) % 2, t + 1, s).start()

    slot = t % 2
    for s in range(splits):
        rd(slot, t, s).wait()
    w0 = w0s_ref[t]

    # wait for the out DMA that used this acc slot two steps ago
    @pl.when(t >= 2)
    def _wback():
        for s in range(osplits):
            wr(slot, t - 2, s).wait()

    def idot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    for g in range(group):
        base = g * tile
        s_g = pl.multiple_of(starts_ref[t * group + g], _WALIGN)
        ids_g = ids_ref[base:base + tile, :]
        col = lax.broadcasted_iota(jnp.int32, (tile, wsub), 1)
        match = ids_g - (w0 + s_g) == col
        oh8 = match.astype(jnp.int8)
        hit = match.any(axis=1, keepdims=True)
        wslice = win[slot, pl.ds(s_g, wsub), :]
        w_i32 = lax.bitcast_convert_type(wslice, jnp.int32)
        acc = jnp.zeros((tile, D), jnp.int32)
        for k in range(4):
            plane = (((w_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
            sel = idot(oh8, plane) + jnp.where(hit, 128, 0)
            acc = acc | ((sel & 0xFF) << (8 * k))
        acc_buf[slot, base:base + tile, :] = lax.bitcast_convert_type(
            acc, jnp.float32
        )

    for s in range(osplits):
        wr(slot, t, s).start()

    @pl.when(t == nt - 1)
    def _drain():
        for s in range(osplits):
            wr(slot, t, s).wait()
            if nt > 1:
                wr((t - 1) % 2, t - 1, s).wait()


@functools.partial(
    jax.jit,
    static_argnames=("tile", "window", "group", "wsub", "splits", "osplits"),
)
def gather_manual_out(
    table, ids, *, tile=128, window=1408, group=8, wsub=224, splits=4,
    osplits=1,
):
    Bn = ids.shape[0]
    n = table.shape[0]
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
            _manual_out_kernel, tile=tile, wsub=wsub, group=group,
            window=window, nt=nt, splits=splits, osplits=osplits,
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((step, 1), lambda t: (t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, window, D), table.dtype),
            pltpu.VMEM((2, step, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, splits)),
            pltpu.SemaphoreType.DMA((2, osplits)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, starts, ids.reshape(Bp, 1), table)
    return out[:Bn]


def run(tag, fn, *args, bytes_moved):
    try:
        dts = sorted(measure_chain(fn, iters, *args) for _ in range(3))
        print(f"{tag}: {bytes_moved / dts[1] / 1e9:.1f} GB/s "
              f"[{', '.join(f'{x*1e3:.2f}' for x in dts)} ms]", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (N, D), jnp.float32)
    )()
    d = 0.8
    span = int(B / d)
    lists = [
        jnp.asarray(np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32))
        for b in rng.randint(0, N - span, size=6)
    ]

    # correctness: manual-out vs the production window kernel
    from wholegraph_tpu.ops.gather_pallas import gather_rows_window
    ref = gather_rows_window(table, lists[0], tile=128, group=8, window=1408,
                             wsub=224)
    got = gather_manual_out(table, lists[0])
    print("manual-out bitequal:", bool(jnp.array_equal(ref, got)), flush=True)
    src = jax.jit(lambda: jnp.ones((1 << 19, D), jnp.float32))()  # 512 MB
    cp = dma_copy(src)
    print("dma copy correct:", bool(jnp.array_equal(cp, src)), flush=True)

    def mkcp(**kw):
        def step(i, s):
            # has_side_effects keeps repeated calls alive under the chain
            return dma_copy(s, **kw)[0, 0]
        return step

    def mk(fn, **kw):
        def step(i, tab):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fn(tab, ids, **kw)[0, 0]
        return step

    cp_bytes = 2 * src.size * 4  # r+w
    run("A dma copy ch4096", mkcp(), src, bytes_moved=cp_bytes)
    run("A dma copy ch8192", mkcp(ch=8192), src, bytes_moved=cp_bytes)
    run("B dma copy ch4096 split4", mkcp(splits=4), src, bytes_moved=cp_bytes)
    out_bytes = B * D * 4
    run("C manual-out split4", mk(gather_manual_out), table,
        bytes_moved=out_bytes)
    run("D manual-out split4 osplit4", mk(gather_manual_out, osplits=4),
        table, bytes_moved=out_bytes)
    run("D2 manual-out split4 osplit2", mk(gather_manual_out, osplits=2),
        table, bytes_moved=out_bytes)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

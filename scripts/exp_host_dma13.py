"""Host-tier round 13: exp12 measured a SINGLE 512 MB host DMA at 14.26
GB/s (and device_put ~22) vs the span ring's 10.35 — the masked issue ring
(1024-slot unrolled loop, per-slot scalar branching) is overhead, not the
link.  Probe the design space for a WINDOW-mode host gather (fetch the
whole contiguous [min,max] slot range with few big static-size DMAs, then
device-side take):

  W1. chunked contiguous fetch: 16 MB static chunks, masked count, 4 inflight
  W2. 32 MB chunks
  W3. 16 MB chunks, 8 inflight
  W4. 4 parallel BIG DMAs (128 MB each, all started together)
  W5. W1 + device-side take to original order (the full window-mode path)

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_host_dma13.py > /tmp/exp_host13.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import SingleDeviceSharding

from wholegraph_tpu.utils.perf import measure_chain

D = 256
B = 1 << 19
SPAN = int(B * 1.25)  # 640K rows ~ 655 MB window
iters = 5


def _chunk_fetch_kernel(lo_ref, n_ref, flat_ref, out_ref, sems,
                        *, chunk_elems, max_chunks, n_inflight):
    def dma(j):
        # HOST memrefs carry a (1024,) element tiling; Mosaic must PROVE the
        # dynamic slice offset divisible by it (r4 sweep: unhinted offsets
        # fail to compile).  lo is 4096-byte-page aligned by construction
        # and chunk_elems % 1024 == 0, so the hint is sound.
        off = pl.multiple_of(lo_ref[0] + j * chunk_elems, 1024)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(off, chunk_elems)],
            out_ref.at[pl.ds(j * chunk_elems, chunk_elems)],
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


@functools.partial(jax.jit,
                   static_argnames=("chunk_elems", "max_chunks", "n_inflight"))
def chunk_fetch(flat, lo, n_chunks, *, chunk_elems, max_chunks, n_inflight):
    return pl.pallas_call(
        functools.partial(_chunk_fetch_kernel, chunk_elems=chunk_elems,
                          max_chunks=max_chunks, n_inflight=n_inflight),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=pltpu.MemorySpace.HBM((max_chunks * chunk_elems,),
                                        flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lo.reshape(1), n_chunks.reshape(1), flat)


def run(tag, step, *args, bytes_moved):
    try:
        dts = sorted(measure_chain(step, iters, *args) for _ in range(3))
        print(f"{tag}: {bytes_moved / dts[1] / 1e9:.2f} GB/s "
              f"({dts[1]*1e3:.1f} ms)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    N = 4_000_000
    flat = jax.device_put(jnp.ones((N * D,), jnp.float32), hs)
    flat.block_until_ready()
    rs = np.random.RandomState(0)
    lists = [
        jnp.asarray(np.sort(b + rs.choice(SPAN, B, replace=False)).astype(np.int32))
        for b in rs.randint(0, N - SPAN, size=4)
    ]
    window_bytes = SPAN * D * 4

    def mk_fetch(chunk_mb, n_inflight):
        ce = chunk_mb * (1 << 20) // 4
        need = SPAN * D
        mc = -(-need // ce) + 1

        def step(i, fl):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            lo = (ids[0].astype(jnp.int32) // 4 * 4) * D  # page-align (4 rows)
            nc = -(-(ids[-1] + 1 - ids[0] // 4 * 4) * D // ce)
            out = chunk_fetch(fl, lo, nc.astype(jnp.int32), chunk_elems=ce,
                              max_chunks=mc, n_inflight=n_inflight)
            return out[0]
        return step

    run("W1 16MB chunks if4", mk_fetch(16, 4), flat, bytes_moved=window_bytes)
    run("W2 32MB chunks if4", mk_fetch(32, 4), flat, bytes_moved=window_bytes)
    run("W3 16MB chunks if8", mk_fetch(16, 8), flat, bytes_moved=window_bytes)
    run("W4 168MB chunks if4", mk_fetch(168, 4), flat, bytes_moved=window_bytes)

    # W5: full window-mode path incl. the device-side take
    ce = 16 * (1 << 20) // 4
    mc = -(-(SPAN * D) // ce) + 1

    def w5(i, fl):
        ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
        lo_row = ids[0] // 4 * 4
        lo = lo_row * D
        nc = -(-(ids[-1] + 1 - lo_row) * D // ce)
        out = chunk_fetch(fl, lo.astype(jnp.int32), nc.astype(jnp.int32),
                          chunk_elems=ce, max_chunks=mc, n_inflight=4)
        rows = out.reshape(-1, D)
        sel = jnp.take(rows, ids - lo_row, axis=0, mode="clip")
        return sel[0, 0]

    run("W5 16MB window + take", w5, flat, bytes_moved=B * D * 4)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

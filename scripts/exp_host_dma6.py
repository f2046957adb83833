"""Host-tier round 6: why is the page fetch ~100 ms/call?

Hypothesis: the whole HOST-space table is marshalled per call (axon tunnel or
H2D staging), so time scales with TABLE size, not fetch size.

  A. fetch nb=1024 4KB pages from tables of 50 MB / 200 MB / 800 MB
  B. fixed put-ring write-back test (arity fixed)

Run: nohup python scripts/exp_host_dma6.py > /tmp/exp_host6.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import SingleDeviceSharding


def fetch_ring(pids_ref, src_ref, out_ref, sems, *, nb, n_inflight, pe):
    def dma(j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(pids_ref[j] * pe, pe)],
            out_ref.at[pl.ds(j * pe, pe)],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _w():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, nb, issue, 0, unroll=True)

    def drain(k, _):
        dma(nb - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def put_ring(pids_ref, rows_ref, host_in_ref, out_ref, sems, *, nb, n_inflight, pe):
    del host_in_ref  # aliased with out_ref

    def dma(j):
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(j * pe, pe)],
            out_ref.at[pl.ds(pids_ref[j] * pe, pe)],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _w():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, nb, issue, 0, unroll=True)

    def drain(k, _):
        dma(nb - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def build_fetch(nb, pe, n_inflight=64):
    @jax.jit
    def run(flat_host, pids):
        return pl.pallas_call(
            functools.partial(fetch_ring, nb=nb, n_inflight=n_inflight, pe=pe),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nb * pe,), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pids, flat_host)

    return run


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    rs = np.random.RandomState(0)
    pe, nb = 1024, 1024

    for NP, tag in ((12_500, "50MB"), (50_000, "200MB"), (200_000, "800MB")):
        flat = jax.device_put(
            jnp.repeat(jnp.arange(NP, dtype=jnp.float32), pe), hs
        )
        flat.block_until_ready()
        pids = jnp.asarray(rs.randint(0, NP, nb).astype(np.int32))
        fn = build_fetch(nb, pe)
        out = fn(flat, pids)
        ok = np.allclose(
            np.asarray(out).reshape(nb, pe)[:, 0], np.asarray(pids, np.float32)
        )
        for _ in range(2):
            fn(flat, pids).block_until_ready()
        t0 = time.perf_counter()
        outs = [fn(flat, pids) for _ in range(8)]
        s = sum(float(x[0]) for x in outs)
        dt = (time.perf_counter() - t0) / 8
        print(
            f"A fetch 4KBx1024 table={tag}: correct={ok} "
            f"{nb*pe*4/dt/1e9:.3f} GB/s ({dt*1e3:.2f} ms)",
            flush=True,
        )
        del flat

    # ---- B: write-back
    NP = 12_500
    host_buf = jax.device_put(jnp.zeros((NP * pe,), jnp.float32), hs)
    pids_np = rs.choice(NP, nb, replace=False).astype(np.int32)
    pids = jnp.asarray(pids_np)
    rows = jnp.repeat(jnp.arange(nb, dtype=jnp.float32) + 1.0, pe)

    @jax.jit
    def run_put(rows_dev, pids, host_buf):
        return pl.pallas_call(
            functools.partial(put_ring, nb=nb, n_inflight=64, pe=pe),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            out_shape=jax.ShapeDtypeStruct((NP * pe,), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((64,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            input_output_aliases={2: 0},
        )(pids, rows_dev, host_buf)

    try:
        out = run_put(rows, pids, host_buf)
        o = np.asarray(out).reshape(NP, pe)
        ok = np.allclose(o[pids_np, 0], np.arange(nb) + 1.0) and np.isclose(
            o.sum(), (np.arange(nb) + 1.0).sum() * pe
        )
        print(f"B put 4KBx1024: correct={ok}", flush=True)
    except Exception as e:
        print(f"B put 4KBx1024: FAIL ...{str(e)[-700:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

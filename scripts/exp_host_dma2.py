"""TPU experiment round 2: make the pinned-host gather path work.

The 3-D [N, D//128, 128] HOST-memref row DMA fails AOT compile:
  LLO_CHECK multiplier_in_bytes % word_size == 0 (512 vs 4096)
=> host-space DMAs appear to need 4 KB granularity.  Variants probed here:

  A. 2-D [N, D] HOST memref, one row per DMA (1 KB chunks)    — compile?
  B. 2-D [N, 1024] f32 (4 KB rows), one row per DMA           — compile?
  C. 4-row block DMA on 2-D [N, 256]: .at[pl.ds(i, 4)] (4 KB) — compile?
  D. compute_on('device_host'): host-side jnp.take + one contiguous
     H2D device_put (XLA path, no pallas)                     — bandwidth?

Run detached:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/exp_host_dma2.py > /tmp/exp_host2.log 2>&1 &
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


def ring_kern(ids_ref, table_ref, out_ref, sems, *, id_block, n_inflight, rows):
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        if rows == 1:
            return pltpu.make_async_copy(
                table_ref.at[idx], out_ref.at[base + j], sems.at[j % n_inflight]
            )
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx, rows)],
            out_ref.at[pl.ds((base + j) * rows, rows)],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _w():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, id_block, issue, 0, unroll=True)

    def drain(k, _):
        dma(id_block - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def build(N, D, B, rows=1, id_block=512, n_inflight=64):
    nds = B // rows  # descriptors

    @jax.jit
    def run(table, ids):
        return pl.pallas_call(
            functools.partial(
                ring_kern, id_block=id_block, n_inflight=n_inflight, rows=rows
            ),
            grid=(nds // id_block,),
            in_specs=[
                pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids, table)

    return run


def bench(fn, *args, iters=6):
    fn(*args).block_until_ready()
    # dynamic chain through two scalar fetches (tunnel-safe)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    s = sum(float(o[0, 0]) for o in outs)
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    rs = np.random.RandomState(0)

    # ---- A: 2-D [N, 256] host memref, 1-row DMAs
    N, D, B = 200_000, 256, 4096
    table = jax.device_put(
        jnp.arange(N, dtype=jnp.float32)[:, None] * jnp.ones((1, D)), hs
    )
    ids = jnp.asarray(rs.randint(0, N, B).astype(np.int32))
    try:
        fn = build(N, D, B, rows=1)
        out = fn(table, ids)
        ok = np.allclose(np.asarray(out)[:, 0], np.asarray(ids, np.float32))
        dt, _ = bench(fn, table, ids)
        print(f"A 2d-row-dma D=256: correct={ok} {B*D*4/dt/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"A 2d-row-dma D=256: FAIL {str(e)[:300]}", flush=True)

    # ---- B: 4 KB rows (D=1024)
    N2, D2, B2 = 100_000, 1024, 4096
    table2 = jax.device_put(
        jnp.arange(N2, dtype=jnp.float32)[:, None] * jnp.ones((1, D2)), hs
    )
    ids2 = jnp.asarray(rs.randint(0, N2, B2).astype(np.int32))
    try:
        fn = build(N2, D2, B2, rows=1)
        out = fn(table2, ids2)
        ok = np.allclose(np.asarray(out)[:, 0], np.asarray(ids2, np.float32))
        dt, _ = bench(fn, table2, ids2)
        print(f"B 2d-row-dma D=1024: correct={ok} {B2*D2*4/dt/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"B 2d-row-dma D=1024: FAIL {str(e)[:300]}", flush=True)

    # ---- C: 4-row block DMAs on D=256 (4 KB chunks, sorted/windowed host fetch)
    ids4 = jnp.asarray((rs.randint(0, N // 4, B // 4) * 4).astype(np.int32))
    try:
        fn = build(N, D, B, rows=4)
        out = fn(table, ids4)
        expect = np.repeat(np.asarray(ids4, np.float32), 4) + np.tile(
            np.arange(4, dtype=np.float32), B // 4
        )
        ok = np.allclose(np.asarray(out)[:, 0], expect)
        dt, _ = bench(fn, table, ids4)
        print(f"C 4-row-dma D=256: correct={ok} {B*D*4/dt/1e9:.2f} GB/s", flush=True)
    except Exception as e:
        print(f"C 4-row-dma D=256: FAIL {str(e)[:300]}", flush=True)

    # ---- D: compute_on host gather + implicit H2D
    from jax.experimental import compute_on

    BD = 65536  # bigger batch: amortize launch

    @jax.jit
    def host_gather(tab, idx):
        with compute_on.compute_on("device_host"):
            rows = jnp.take(tab, idx, axis=0)
        return jax.device_put(rows, jax.sharding.SingleDeviceSharding(dev)) * 1.0

    idsd = jnp.asarray(rs.randint(0, N, BD).astype(np.int32))
    idsd_h = jax.device_put(idsd, hs)
    for name, idarg in (("dev-ids", idsd), ("host-ids", idsd_h)):
        try:
            out = host_gather(table, idarg)
            ok = np.allclose(np.asarray(out)[:, 0], np.asarray(idsd, np.float32))
            dt, _ = bench(host_gather, table, idarg)
            print(
                f"D compute_on-host D=256 B=64K ({name}): correct={ok} "
                f"{BD*D*4/dt/1e9:.2f} GB/s",
                flush=True,
            )
        except Exception as e:
            print(f"D compute_on-host ({name}): FAIL {str(e)[:300]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Host-tier gather round 5: page-granular flat-memref DMA ring.

Mosaic facts so far: HOST memrefs are usable only as 1-D flat arrays
(tiled<(1024)> for f32 = 4 KB pages); slices must be tile-aligned; 2-D/3-D
host memrefs get (8,128) tiling whose 512 B chunks trip the LLO 4 KB check.

  A. flat host -> flat HBM, pe=1024 f32 page DMAs   — compile? bandwidth?
  B. flat HBM -> flat host (write-back)             — compile? bandwidth?
  C. bigger chunks (pe=4096: 16 KB)                  — bandwidth?

Run: nohup python scripts/exp_host_dma5.py > /tmp/exp_host5.log 2>&1 &
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


def ring(pids_ref, src_ref, out_ref, sems, *, nb, n_inflight, pe, src_pages):
    def dma(j):
        p = pids_ref[j]
        if src_pages:
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(p * pe, pe)],
                out_ref.at[pl.ds(j * pe, pe)],
                sems.at[j % n_inflight],
            )
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(j * pe, pe)],
            out_ref.at[pl.ds(p * pe, pe)],
            sems.at[j % n_inflight],
        )

    def issue(j, _):
        @pl.when(jnp.logical_and(j >= n_inflight, pids_ref[j - n_inflight] >= 0))
        def _w():
            dma(j - n_inflight).wait()

        @pl.when(pids_ref[j] >= 0)
        def _s():
            dma(j).start()

        return 0

    lax.fori_loop(0, nb, issue, 0, unroll=True)

    def drain(k, _):
        j = nb - n_inflight + k

        @pl.when(jnp.logical_and(j >= 0, pids_ref[j] >= 0))
        def _w():
            dma(j).wait()

        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def build_fetch(nb, pe, n_inflight=64):
    @jax.jit
    def run(flat_host, pids):
        return pl.pallas_call(
            functools.partial(
                ring, nb=nb, n_inflight=n_inflight, pe=pe, src_pages=True
            ),
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


def build_put(nb, pe, npages_out, n_inflight=64):
    @jax.jit
    def run(rows_dev, pids, host_buf):
        return pl.pallas_call(
            functools.partial(
                ring, nb=nb, n_inflight=n_inflight, pe=pe, src_pages=False
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            out_shape=jax.ShapeDtypeStruct((npages_out * pe,), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            input_output_aliases={2: 0},
        )(pids, rows_dev, host_buf)

    return run


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    rs = np.random.RandomState(0)

    NP = 50_000  # pages
    for pe, tag in ((1024, "4KB"), (4096, "16KB")):
        flat = jax.device_put(
            jnp.repeat(jnp.arange(NP, dtype=jnp.float32), pe), hs
        )
        for nb in (1024, 4096):
            pids = jnp.asarray(rs.randint(0, NP, nb).astype(np.int32))
            try:
                fn = build_fetch(nb, pe)
                out = fn(flat, pids)
                o = np.asarray(out).reshape(nb, pe)
                ok = np.allclose(o[:, 0], np.asarray(pids, np.float32)) and np.allclose(
                    o[:, -1], np.asarray(pids, np.float32)
                )
                fn(flat, pids).block_until_ready()
                t0 = time.perf_counter()
                outs = [fn(flat, pids) for _ in range(6)]
                s = sum(float(x[0]) for x in outs)
                dt = (time.perf_counter() - t0) / 6
                print(
                    f"A fetch {tag} nb={nb}: correct={ok} "
                    f"{nb*pe*4/dt/1e9:.2f} GB/s ({dt*1e3:.2f} ms)",
                    flush=True,
                )
            except Exception as e:
                print(f"A fetch {tag} nb={nb}: FAIL ...{str(e)[-700:]}", flush=True)
                break

    # ---- B: write-back ring (HBM rows -> host pages)
    pe, nb = 1024, 1024
    host_buf = jax.device_put(jnp.zeros((NP * pe,), jnp.float32), hs)
    pids_np = rs.choice(NP, nb, replace=False).astype(np.int32)
    pids = jnp.asarray(pids_np)
    rows = jnp.repeat(jnp.arange(nb, dtype=jnp.float32) + 1.0, pe)
    try:
        fn = build_put(nb, pe, NP)
        out = fn(rows, pids, host_buf)
        o = np.asarray(out).reshape(NP, pe)
        ok = np.allclose(o[pids_np, 0], np.arange(nb) + 1.0) and np.isclose(
            o.sum(), (np.arange(nb) + 1.0).sum() * pe
        )
        print(f"B put 4KB nb={nb}: correct={ok}", flush=True)
    except Exception as e:
        print(f"B put 4KB nb={nb}: FAIL ...{str(e)[-700:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

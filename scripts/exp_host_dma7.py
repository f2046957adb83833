"""Host-tier round 7: isolate the 'Unimplemented DMA from host to vmem'
compile failure seen when the fetch ring gains a grid.

Variants (all: fetch nb 4KB pages from a flat HOST memref):
  A. gridless, whole-SMEM ids, ANY out          (exp6 baseline — worked)
  B. gridless, whole-SMEM ids, HBM-pinned out
  C. grid=2,  whole-SMEM ids (un-blocked), HBM out, base = pid*blk
  D. grid=2,  BLOCKED SMEM ids (pipelined), HBM out
  E. grid=2,  BLOCKED SMEM ids, ANY out

Run: nohup python scripts/exp_host_dma7.py > /tmp/exp_host7.log 2>&1 &
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

PE = 1024  # f32 elems per 4KB page
NP = 25_000
NB = 2048


def ring(dma, n, n_inflight):
    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _w():
            dma(j - n_inflight).wait()

        dma(j).start()
        return 0

    lax.fori_loop(0, n, issue, 0, unroll=True)

    def drain(k, _):
        dma(n - n_inflight + k).wait()
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


def k_whole(ids_ref, src_ref, out_ref, sems, *, nb, ni):
    def dma(j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(ids_ref[j] * PE, PE)],
            out_ref.at[pl.ds(j * PE, PE)],
            sems.at[j % ni],
        )

    ring(dma, nb, ni)


def k_grid_whole(ids_ref, src_ref, out_ref, sems, *, blk, ni):
    base = pl.program_id(0) * blk

    def dma(j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(ids_ref[base + j] * PE, PE)],
            out_ref.at[pl.ds((base + j) * PE, PE)],
            sems.at[j % ni],
        )

    ring(dma, blk, ni)


def k_grid_blocked(ids_ref, src_ref, out_ref, sems, *, blk, ni):
    base = pl.program_id(0) * blk

    def dma(j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(ids_ref[j] * PE, PE)],
            out_ref.at[pl.ds((base + j) * PE, PE)],
            sems.at[j % ni],
        )

    ring(dma, blk, ni)


def build(tag, grid, ids_spec, out_space, kern, blk, ni=64):
    @jax.jit
    def run(flat_host, pids):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                ids_spec,
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=out_space),
            out_shape=jax.ShapeDtypeStruct((NB * PE,), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((ni,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pids, flat_host)

    return run


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    flat = jax.device_put(jnp.repeat(jnp.arange(NP, dtype=jnp.float32), PE), hs)
    flat.block_until_ready()
    rs = np.random.RandomState(0)
    pids_np = rs.randint(0, NP, NB).astype(np.int32)
    pids = jnp.asarray(pids_np)

    smem_whole = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk = NB // 2
    smem_blocked = pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.SMEM)
    ANY, HBM = pltpu.ANY, pltpu.MemorySpace.HBM

    cases = [
        ("A gridless whole ANY", None, smem_whole, ANY,
         functools.partial(k_whole, nb=NB, ni=64)),
        ("B gridless whole HBM", None, smem_whole, HBM,
         functools.partial(k_whole, nb=NB, ni=64)),
        ("C grid2 whole HBM", (2,), smem_whole, HBM,
         functools.partial(k_grid_whole, blk=blk, ni=64)),
        ("D grid2 blocked HBM", (2,), smem_blocked, HBM,
         functools.partial(k_grid_blocked, blk=blk, ni=64)),
        ("E grid2 blocked ANY", (2,), smem_blocked, ANY,
         functools.partial(k_grid_blocked, blk=blk, ni=64)),
    ]
    for tag, grid, ids_spec, out_space, kern in cases:
        try:
            fn = build(tag, grid, ids_spec, out_space, kern, blk)
            out = fn(flat, pids)
            ok = np.allclose(
                np.asarray(out).reshape(NB, PE)[:, 0],
                np.asarray(pids_np, np.float32),
            )
            fn(flat, pids).block_until_ready()
            t0 = time.perf_counter()
            outs = [fn(flat, pids) for _ in range(4)]
            s = sum(float(x[0]) for x in outs)
            dt = (time.perf_counter() - t0) / 4
            print(
                f"{tag}: correct={ok} {NB*PE*4/dt/1e9:.3f} GB/s"
                f" ({dt*1e3:.2f} ms)",
                flush=True,
            )
        except Exception as e:
            print(f"{tag}: FAIL ...{str(e)[-300:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

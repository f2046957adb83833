"""Host-tier gather round 4.

  A. 1-D flat [N*D] HOST memref, pl.ds(idx*D, D) row slice  — compile?
  B. page view [P, 8, 128] f32 (4 KB page), .at[p] slice    — compile?
  C. compute_on host gather at B=256K (latency vs bandwidth split)

Run: nohup python scripts/exp_host_dma4.py > /tmp/exp_host4.log 2>&1 &
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


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    rs = np.random.RandomState(0)
    N, D, B = 100_000, 256, 1024
    tab_np = np.arange(N, dtype=np.float32)[:, None] * np.ones((1, D), np.float32)

    # ---- A: flat 1-D + pl.ds
    flat = jax.device_put(jnp.asarray(tab_np.reshape(-1)), hs)
    ids = jnp.asarray(rs.randint(0, N, B).astype(np.int32))

    def kern_a(ids_ref, flat_ref, out_ref, sems):
        def dma(j):
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(ids_ref[j] * D, D)],
                out_ref.at[j],
                sems.at[j % 16],
            )

        def issue(j, _):
            @pl.when(j >= 16)
            def _w():
                dma(j - 16).wait()

            dma(j).start()
            return 0

        lax.fori_loop(0, B, issue, 0, unroll=True)

        def drain(k, _):
            dma(B - 16 + k).wait()
            return 0

        lax.fori_loop(0, 16, drain, 0, unroll=True)

    @jax.jit
    def run_a(flat, ids):
        return pl.pallas_call(
            kern_a,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids, flat)

    try:
        out = run_a(flat, ids)
        ok = np.allclose(np.asarray(out)[:, 0], np.asarray(ids, np.float32))
        print(f"A flat-ds D=256: correct={ok}", flush=True)
    except Exception as e:
        print(f"A flat-ds D=256: FAIL ...{str(e)[-1500:]}", flush=True)

    # ---- B: 4 KB page view [P, 8, 128], page DMA
    P = N * D // 1024
    pages = jax.device_put(jnp.asarray(tab_np.reshape(P, 8, 128)), hs)
    pids = jnp.asarray(rs.randint(0, P, B).astype(np.int32))

    def kern_b(ids_ref, pg_ref, out_ref, sems):
        def dma(j):
            return pltpu.make_async_copy(
                pg_ref.at[ids_ref[j]], out_ref.at[j], sems.at[j % 16]
            )

        def issue(j, _):
            @pl.when(j >= 16)
            def _w():
                dma(j - 16).wait()

            dma(j).start()
            return 0

        lax.fori_loop(0, B, issue, 0, unroll=True)

        def drain(k, _):
            dma(B - 16 + k).wait()
            return 0

        lax.fori_loop(0, 16, drain, 0, unroll=True)

    @jax.jit
    def run_b(pages, pids):
        return pl.pallas_call(
            kern_b,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pids, pages)

    try:
        out = run_b(pages, pids)
        expect = tab_np.reshape(P, 8, 128)[np.asarray(pids)]
        ok = np.allclose(np.asarray(out), expect)
        if ok:
            run_b(pages, pids).block_until_ready()
            t0 = time.perf_counter()
            outs = [run_b(pages, pids) for _ in range(6)]
            s = sum(float(o[0, 0, 0]) for o in outs)
            dt = (time.perf_counter() - t0) / 6
            print(
                f"B page-dma 4KB: correct={ok} {B*4096/dt/1e9:.2f} GB/s",
                flush=True,
            )
        else:
            print(f"B page-dma 4KB: WRONG", flush=True)
    except Exception as e:
        print(f"B page-dma 4KB: FAIL ...{str(e)[-1500:]}", flush=True)

    # ---- C: compute_on at 256K rows
    from jax.experimental import compute_on

    tab_h = jax.device_put(jnp.asarray(tab_np), hs)
    BD = 262144
    idsd = jnp.asarray(rs.randint(0, N, BD).astype(np.int32))

    @jax.jit
    def host_gather(tab, idx):
        idx_h = jax.device_put(idx, jax.memory.Space.Host)
        with compute_on.compute_on("device_host"):
            rows = lax.gather(
                tab,
                idx_h[:, None],
                lax.GatherDimensionNumbers(
                    offset_dims=(1,),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0,),
                ),
                (1, D),
                mode=lax.GatherScatterMode.CLIP,
            )
        return jax.device_put(rows, jax.memory.Space.Device) * 1.0

    try:
        out = host_gather(tab_h, idsd)
        ok = np.allclose(np.asarray(out)[:, 0], np.asarray(idsd, np.float32))
        host_gather(tab_h, idsd).block_until_ready()
        t0 = time.perf_counter()
        outs = [host_gather(tab_h, idsd) for _ in range(4)]
        s = sum(float(o[0, 0]) for o in outs)
        dt = (time.perf_counter() - t0) / 4
        print(
            f"C compute_on B=256K: correct={ok} {BD*D*4/dt/1e9:.2f} GB/s "
            f"({dt*1e3:.1f} ms)",
            flush=True,
        )
    except Exception as e:
        print(f"C compute_on B=256K: FAIL ...{str(e)[-800:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Host-tier gather round 3: full compile errors + in-jit memory transfers.

  A. 2-D [N,256] HOST memref row DMA — print FULL compile error
  B. compute_on('device_host') with ids transferred to host inside jit
     (TransferToMemoryKind), output transferred back — bandwidth?

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/exp_host_dma3.py > /tmp/exp_host3.log 2>&1 &
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

    N, D, B = 200_000, 256, 4096
    table = jax.device_put(
        jnp.arange(N, dtype=jnp.float32)[:, None] * jnp.ones((1, D)), hs
    )
    ids = jnp.asarray(rs.randint(0, N, B).astype(np.int32))

    # ---- A full error
    def kern(ids_ref, table_ref, out_ref, sems):
        def dma(j):
            return pltpu.make_async_copy(
                table_ref.at[ids_ref[j]], out_ref.at[j], sems.at[j % 16]
            )

        def issue(j, _):
            @pl.when(j >= 16)
            def _w():
                dma(j - 16).wait()

            dma(j).start()
            return 0

        lax.fori_loop(0, 256, issue, 0, unroll=True)

        def drain(k, _):
            dma(256 - 16 + k).wait()
            return 0

        lax.fori_loop(0, 16, drain, 0, unroll=True)

    @jax.jit
    def run(table, ids):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((256, D), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids[:256], table)

    try:
        out = run(table, ids)
        ok = np.allclose(np.asarray(out)[:, 0], np.asarray(ids[:256], np.float32))
        print(f"A 2d-row-dma D=256: correct={ok}", flush=True)
    except Exception as e:
        print(f"A 2d-row-dma D=256: FAIL\n{str(e)[-4000:]}", flush=True)

    # ---- B compute_on with in-jit transfers
    from jax.experimental import compute_on


    BD = 65536
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
        out = host_gather(table, idsd)
        ok = np.allclose(np.asarray(out)[:, 0], np.asarray(idsd, np.float32))
        host_gather(table, idsd).block_until_ready()
        t0 = time.perf_counter()
        outs = [host_gather(table, idsd) for _ in range(6)]
        s = sum(float(o[0, 0]) for o in outs)
        dt = (time.perf_counter() - t0) / 6
        print(
            f"B compute_on-host D=256 B=64K: correct={ok} {BD*D*4/dt/1e9:.2f} GB/s",
            flush=True,
        )
    except Exception as e:
        print(f"B compute_on-host: FAIL\n{str(e)[-4000:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

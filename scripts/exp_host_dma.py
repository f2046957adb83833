"""TPU experiment: pinned-host tables + pallas HOST-space DMA gather.

Questions:
  1. does jax.device_put(..., memory_kind='pinned_host') work on axon v5e?
  2. can a pallas kernel take a HOST-memref input and DMA rows host->HBM?
  3. what host->HBM row-gather bandwidth do we get (vs ~124 GB/s HBM->HBM)?
  4. does the reverse (HBM->host row scatter) work?

Run detached:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/exp_host_dma.py > /tmp/exp_host.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import SingleDeviceSharding


def kern(ids_ref, table_ref, out_ref, sems, *, id_block, n_inflight):
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[base + j], sems.at[j % n_inflight]
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


def build_host_gather(N, D, B, id_block=1024, n_inflight=128):
    @jax.jit
    def run(table3, ids):
        return pl.pallas_call(
            functools.partial(kern, id_block=id_block, n_inflight=n_inflight),
            grid=(B // id_block,),
            in_specs=[
                pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, D // 128, 128), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids, table3)

    return run


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # 1. pinned_host placement
    try:
        x = jnp.arange(1024, dtype=jnp.float32).reshape(8, 128)
        sh = SingleDeviceSharding(dev, memory_kind="pinned_host")
        xh = jax.device_put(x, sh)
        print("pinned_host put OK:", xh.sharding.memory_kind, flush=True)
    except Exception as e:
        print("pinned_host put FAILED:", str(e)[:300], flush=True)
        return

    # 2. small host-DMA gather correctness
    N, D, B = 100_000, 256, 4096
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, D), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, N, dtype=jnp.int32)
    want = jnp.take(table, ids, axis=0)
    table_h = jax.device_put(
        table.reshape(N, D // 128, 128), SingleDeviceSharding(dev, memory_kind="pinned_host")
    )
    try:
        t0 = time.perf_counter()
        run = build_host_gather(N, D, B)
        got = run(table_h, ids).reshape(B, D)
        ok = bool(jnp.all(got == want))
        print(f"host-DMA gather small: {ok} (compile {time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print("host-DMA gather FAILED:", type(e).__name__, str(e)[:400], flush=True)
        return

    # 3. bandwidth at bench shape
    N2, B2 = 4_000_000, 1 << 19
    table2_h = jax.device_put(
        jnp.zeros((N2, D // 128, 128), jnp.float32),
        SingleDeviceSharding(dev, memory_kind="pinned_host"),
    )
    ids2 = jax.random.randint(jax.random.PRNGKey(2), (B2,), 0, N2, dtype=jnp.int32)
    run2 = build_host_gather(N2, D, B2)

    @jax.jit
    def chain(t, ids, n):
        def body(i, acc):
            out = run2(t, ids + (i % 2))
            return acc + out[0, 0, 0]

        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(chain(table2_h, ids2, 1))
    t0 = time.perf_counter()
    float(chain(table2_h, ids2, 1))
    base = time.perf_counter() - t0
    iters = 4
    t0 = time.perf_counter()
    float(chain(table2_h, ids2, 1 + iters))
    dt = max((time.perf_counter() - t0 - base) / iters, 1e-9)
    print(f"host-DMA gather: {B2 * D * 4 / dt / 1e9:.1f} GB/s ({dt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

"""Host-tier round 12: is ~10.35 GB/s (exp_host_dma11 fetch-only, size-
independent 32K-1M spans) the LINK's byte rate or just the pallas DMA
engine's?  Probe other host->device paths at the same 640 MB volume:

  A. XLA jit consume of a whole pinned_host slab (host->HBM transfer the
     XLA way: out = slab * 1.0 with slab in pinned_host)
  B. ONE giant pallas host DMA (single descriptor, 640 MB)
  C. jax.device_put(pinned_host array) wall-clock (non-jit copy machinery)

If all land ~10.3 GB/s the link is calibrated and the clustered-span
gather (7.3 GB/s delivered at 1.25x overfetch + select) is within ~12% of
its structural ceiling (10.35 x 0.8 = 8.3) -> negative record for the
">=10 GB/s" target.  Also re-runs the dma11 correctness probe with a
fixed expected-value table (the dma11 one compared r*D against r).

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_host_dma12.py > /tmp/exp_host12.log 2>&1 &
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

from wholegraph_tpu.ops.gather_pallas import host_gather_rows_spans
from wholegraph_tpu.utils.perf import measure_chain

D = 256
ROWS = 1 << 19  # 512K rows x 1KB = 512 MB slab
iters = 4


def _big_dma_kernel(flat_ref, out_ref, sem, *, n):
    cp = pltpu.make_async_copy(flat_ref.at[pl.ds(0, n)], out_ref, sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("n",))
def big_dma(flat, *, n):
    return pl.pallas_call(
        functools.partial(_big_dma_kernel, n=n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=pltpu.MemorySpace.HBM((n,), flat.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat)


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
    nbytes = ROWS * D * 4

    # fixed correctness probe (row value == row index, < 2^22 so f32-exact)
    small = jax.device_put(
        (jnp.arange(4000, dtype=jnp.float32)[:, None]
         * jnp.ones((1, D), jnp.float32)).reshape(-1), hs)
    small.block_until_ready()
    rs = np.random.RandomState(0)
    sl = jnp.asarray(np.sort(rs.choice(3000, 2048, replace=False)).astype(np.int32))
    got = host_gather_rows_spans(small, sl, dim=D, span_rows=256,
                                 max_spans=16, n_inflight=8)
    want = np.asarray(sl, np.float32)[:, None] * np.ones((1, D), np.float32)
    print("spans(256-row) correct:", bool(np.array_equal(np.asarray(got), want)),
          flush=True)

    def xla_consume(i, fl):
        sl = lax.dynamic_slice(fl, ((i % 4) * 1024,), (ROWS * D,))
        return lax.optimization_barrier(sl * 1.0)[0]

    run("A XLA jit host slab consume", xla_consume, flat, bytes_moved=nbytes)

    def one_dma(i, fl):
        return big_dma(fl, n=ROWS * D)[0]

    run("B single 512MB pallas host DMA", one_dma, flat, bytes_moved=nbytes)

    # C: device_put wall clock (non-jit path; tunnel-noisy, report anyway)
    host_np = np.ones((ROWS * D,), np.float32)
    pinned = jax.device_put(jnp.asarray(host_np), hs)
    pinned.block_until_ready()
    hbm = SingleDeviceSharding(dev)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_put(pinned, hbm)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"C device_put pinned->HBM: {nbytes / sorted(ts)[1] / 1e9:.2f} GB/s "
          f"({sorted(ts)[1]*1e3:.1f} ms) [block_until_ready may lie through "
          "the tunnel]", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

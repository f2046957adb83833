"""TPU experiment 2: tuned (tile, window) for the windowed gather.

Theory from exp_window_gather: f32 is MXU-bound at Precision.HIGHEST
(~33 TF/s => rows/s = 33e12 / (2*W*D)), so W must be as tight as coverage
allows: W = tile + 32 (alignment slack) at density 1.  bf16 is ~6x cheaper
on the MXU, fetch-bound instead.  Sweep tight windows at d=1.0 and matched
windows at d=0.5.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
      scripts/exp_window_gather2.py > /tmp/exp_window2.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import gather_rows_window, window_coverage
from wholegraph_tpu.utils.perf import measure_chain

N = 4_000_000
D = 256
B = 1 << 19


def sorted_ids_density(rng, density, batch):
    span = int(batch / density)
    start = rng.randint(0, N - span)
    ids = start + rng.choice(span, batch, replace=False)
    ids.sort()
    return jnp.asarray(ids.astype(np.int32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    cases = [
        # (density, tile, window)
        (1.0, 128, 160),
        (1.0, 256, 288),
        (1.0, 512, 544),
        (1.0, 1024, 1056),
        (0.5, 256, 544),
        (0.5, 128, 288),
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        itemsize = jnp.dtype(dtype).itemsize
        table = jax.jit(lambda: jnp.ones((N, D), dtype))()
        for density, tile, window in cases:
            ids_pair = [sorted_ids_density(rng, density, B) for _ in range(2)]
            cov, _ = window_coverage(ids_pair[0], N, tile=tile, window=window)
            if float(cov) < 0.999:
                print(f"skip d={density} t={tile} w={window} cov={float(cov)}")
                continue

            def step(i, tab, ids_pair=ids_pair, tile=tile, window=window):
                ids = jax.lax.switch(i % 2, [lambda x=x: x for x in ids_pair])
                out = gather_rows_window(tab, ids, tile=tile, window=window)
                return out[0, 0].astype(jnp.float32)

            try:
                t0 = time.time()
                dt = measure_chain(step, 6, table)
                gbps = B * D * itemsize / dt / 1e9
                print(
                    f"WINDOW dtype={dtype.__name__} d={density} tile={tile} "
                    f"window={window} {gbps:.1f} GB/s ({dt*1e3:.2f} ms, "
                    f"compile {time.time()-t0:.0f}s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"FAIL dtype={dtype.__name__} d={density} t={tile} "
                    f"w={window}: {type(e).__name__} {str(e)[:200]}",
                    flush=True,
                )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

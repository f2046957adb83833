"""TPU experiment: windowed multi-row-DMA gather (sorted ids + MXU one-hot).

Validates gather_rows_window (ops/gather_pallas.py) on hardware:
  1. bit-exact correctness vs jnp.take for in-window sorted ids (f32 + bf16)
  2. bandwidth vs sorted-id density d in {1.0, 0.5, 0.25, 0.125}
     for (tile, window) in a small matrix, f32 and bf16, D=256
  3. reference: the descriptor-bound single-row ring on the same batches

Run detached (remote compiles are minutes):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
      scripts/exp_window_gather.py > /tmp/exp_window.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import (
    gather_rows_window,
    gather_rows_pallas,
    window_coverage,
)
from wholegraph_tpu.utils.perf import measure_chain

N = 4_000_000
D = 256
B = 1 << 19


def sorted_ids_density(rng, density, batch):
    """Sorted ids whose distinct-row density over their span is ~density."""
    span = int(batch / density)
    start = rng.randint(0, N - span)
    ids = start + rng.choice(span, batch, replace=False)
    ids.sort()
    return jnp.asarray(ids.astype(np.int32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    # --- correctness, small ---
    for dtype in (jnp.float32, jnp.bfloat16):
        tab = jax.jit(
            lambda: (
                jax.random.normal(jax.random.PRNGKey(1), (100_000, D)) * 100
            ).astype(dtype)
        )()
        ids = sorted_ids_density(rng, 0.5, 4096) % 100_000
        ids = jnp.sort(ids)
        out = gather_rows_window(tab, ids, tile=256, window=1024)
        ref = jnp.take(tab, ids, axis=0)
        cov, dens = window_coverage(ids, 100_000, tile=256, window=1024)
        inwin = np.asarray(out != 0).any(axis=1)  # zero rows = window miss
        exact = np.array_equal(
            np.asarray(out)[inwin], np.asarray(ref)[inwin]
        )
        print(
            f"correct dtype={dtype.__name__} cov={float(cov):.4f} "
            f"dens={float(dens):.3f} bitexact_inwindow={exact}",
            flush=True,
        )

    # --- bandwidth matrix ---
    for dtype in (jnp.float32, jnp.bfloat16):
        itemsize = jnp.dtype(dtype).itemsize
        table = jax.jit(
            lambda: jnp.ones((N, D), dtype)
        )()
        for density in (1.0, 0.5, 0.25, 0.125):
            ids = sorted_ids_density(rng, density, B)
            for tile, window in ((256, 512), (256, 1024), (512, 1024), (512, 2048)):
                if window * tile == 0 or window > N:
                    continue
                cov, _ = window_coverage(ids, N, tile=tile, window=window)
                cov = float(cov)
                if cov < 0.999:
                    print(
                        f"skip d={density} t={tile} w={window} cov={cov:.4f}",
                        flush=True,
                    )
                    continue

                def step(i, tab, ids=ids, tile=tile, window=window):
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
                        f"FAIL dtype={dtype.__name__} d={density} tile={tile} "
                        f"window={window}: {type(e).__name__} {str(e)[:300]}",
                        flush=True,
                    )

        # ring reference on the same (sorted, d=1.0) batch
        ids = sorted_ids_density(rng, 1.0, B)

        def ring_step(i, tab, ids=ids):
            out = gather_rows_pallas(tab, ids)
            return out[0, 0].astype(jnp.float32)

        try:
            dt = measure_chain(ring_step, 6, table)
            print(
                f"RING dtype={dtype.__name__} sorted d=1.0 "
                f"{B * D * itemsize / dt / 1e9:.1f} GB/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"RING FAIL {dtype.__name__}: {str(e)[:200]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

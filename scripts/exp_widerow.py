"""A/B the wide-row sub-slab split (VERDICT r2 item 3): whole-slab ring vs
auto-split sub-slab ring for rows past the ~2KB DMA sweet spot.

Round-2 measured (whole-slab): dim 256 f32 127 GB/s, dim 512 203, dim
768/1024 ~70 (the cliff).  Hypothesis: descriptors in the 1-2KB range ride
the sweet spot, so dim-1024 rows moved as 2 x 2KB sub-rows should recover
~203 GB/s-class rates (2x descriptor count at half the size each).

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_widerow.py > /tmp/exp_widerow.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import (
    _gather_rows_pallas3_impl,
    _wide_row_split,
    scatter_rows_pallas3,
)
from wholegraph_tpu.utils.perf import measure_chain


def median3(step, iters, *args):
    return sorted(measure_chain(step, iters, *args) for _ in range(3))[1]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    B, iters = 1 << 18, 6

    for dim in (512, 768, 1024, 1536):
        P = dim // 128
        N = int(min(2_000_000, 4e9 / (dim * 4) / 2))
        table3 = jax.jit(
            lambda N=N, P=P: jnp.ones((N, P, 128), jnp.float32)
        )()
        ids = jnp.asarray(rng.randint(0, N, B).astype(np.int32))
        auto_k = _wide_row_split(P, 4)

        for tag, split in (("whole", 1), (f"auto(k={auto_k})", None)):
            if split == 1 and auto_k == 1:
                continue  # same config; measure once via auto

            def step(i, tab, ids=ids, split=split):
                out = _gather_rows_pallas3_impl(
                    tab, ids + (i % 7) * 0, split=split
                )
                return out[0, 0, 0]

            dt = median3(step, iters, table3, )
            print(
                f"gather dim={dim} {tag}: {B*dim*4/dt/1e9:.1f} GB/s "
                f"({dt*1e3:.2f} ms)",
                flush=True,
            )

        rows3 = jax.jit(
            lambda B=B, P=P: jnp.zeros((B, P, 128), jnp.float32)
        )()

        # scatter: table is the donated fori_loop CARRY (bench.py pattern) —
        # this also reveals whether the wide-row re-view is a free bitcast
        # or a per-iteration relayout on a carried buffer
        import functools
        import time

        for tag, split in (("whole", 1), (f"auto(k={auto_k})", None)):
            if split == 1 and auto_k == 1:
                continue

            @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
            def scatter_n(tab, ids, rows3, n, split=split):
                return jax.lax.fori_loop(
                    0, n,
                    lambda i, t: scatter_rows_pallas3(
                        t, ids, rows3, split=split
                    ),
                    tab,
                )

            tabc = jnp.copy(table3)
            tabc = scatter_n(tabc, ids, rows3, 1)
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                tabc = scatter_n(tabc, ids, rows3, 1)
                float(tabc[0, 0, 0])
                base = time.perf_counter() - t0
                t0 = time.perf_counter()
                tabc = scatter_n(tabc, ids, rows3, 1 + iters)
                float(tabc[0, 0, 0])
                samples.append(
                    max((time.perf_counter() - t0 - base) / iters, 1e-9)
                )
            dt = sorted(samples)[1]
            print(
                f"scatter dim={dim} {tag}: {B*dim*4/dt/1e9:.1f} GB/s "
                f"({dt*1e3:.2f} ms)",
                flush=True,
            )
        del table3
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

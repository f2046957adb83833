"""Diagnose bench_gather_sorted's 20 GB/s (raw grouped kernel: 224 GB/s).

Isolates local_take_sorted's integration pieces at the bench shape
(N=4M, D=256, B=512K, density 0.8):

  A. local_take_sorted d=0.8          (bench repro)
  B. gather_rows_window alone, same plan as A (no repair, no miss calc)
  C. local_take_sorted d=0.95         (the exp3 sweet spot density)
  D. miss-mask + cond overhead only: d=1.0 contiguous ids (zero misses)
  E. repair worst case: reversed ids (all miss -> full masked ring)

Run: nohup PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_lts_diag.py > /tmp/exp_lts.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import (
    _window_plan,
    gather_rows_window,
    local_take_sorted,
)
from wholegraph_tpu.utils.perf import measure_chain

N, D, B = 4_000_000, 256, 1 << 19


def ids_at_density(rng, density):
    span = int(B / density)
    start = rng.randint(0, N - span)
    ids = start + rng.choice(span, B, replace=False)
    ids.sort()
    return jnp.asarray(ids.astype(np.int32))


def bench(tag, fn, ids_list, iters=8):
    def step(i, tab):
        ids = jax.lax.switch(i % len(ids_list), [lambda x=x: x for x in ids_list])
        return fn(tab, ids)[0, 0]

    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()
    dt = measure_chain(step, iters, table)
    print(f"{tag}: {B * D * 4 / dt / 1e9:.1f} GB/s ({dt*1e3:.2f} ms)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    ids08 = [ids_at_density(rng, 0.8192) for _ in range(4)]
    ids095 = [ids_at_density(rng, 0.95) for _ in range(4)]
    ids10 = [
        jnp.arange(s, s + B, dtype=jnp.int32)
        for s in (0, 1_000_000, 2_000_000, 3_000_000)
    ]
    rev = [jnp.asarray(np.asarray(i)[::-1].copy()) for i in ids08[:2]]

    tile, window, group = _window_plan(0.8192, None, None)
    print(f"plan(0.8192): tile={tile} window={window} group={group}", flush=True)
    t95, w95, g95 = _window_plan(0.95, None, None)
    print(f"plan(0.95): tile={t95} window={w95} group={g95}", flush=True)

    bench(
        "A lts d=0.82",
        lambda t, i: local_take_sorted(t, i, density=0.8192),
        ids08,
    )
    bench(
        "B window-only plan(0.82)",
        lambda t, i: gather_rows_window(t, i, tile=tile, window=window, group=group),
        ids08,
    )
    bench(
        "C lts d=0.95",
        lambda t, i: local_take_sorted(t, i, density=0.95),
        ids095,
    )
    bench(
        "D lts contiguous (no miss)",
        lambda t, i: local_take_sorted(t, i, density=1.0),
        ids10,
    )
    bench(
        "E lts reversed (all miss)",
        lambda t, i: local_take_sorted(t, i, density=0.8192),
        rev,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

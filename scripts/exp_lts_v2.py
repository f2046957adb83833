"""Validate + tune the integrated dynamic-start local_take_sorted.

1. Correctness: exact vs jnp.take on random sorted batches at several
   densities (repair path must make it exact regardless of coverage),
   f32 + bf16, plus a pathological all-miss batch.
2. Perf at the bench shape (N=4M, D=256, B=512K): end-to-end
   local_take_sorted at d in {0.95, 0.8, 0.5} with the default plan and a
   wsub/slack sweep.

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_lts_v2.py > /tmp/exp_lts_v2.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import (
    _window_plan,
    local_take_sorted,
)
from wholegraph_tpu.utils.perf import measure_chain

N, D, B = 4_000_000, 256, 1 << 19


def sorted_ids(rng, density, batch, n=N):
    span = min(n, int(batch / density))
    start = rng.randint(0, n - span + 1)
    ids = start + rng.choice(span, batch, replace=False)
    ids.sort()
    return ids.astype(np.int32)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    # --- correctness ---
    Nc = 200_000
    for dtype in (jnp.float32, jnp.bfloat16):
        tab = jax.jit(
            lambda: (jax.random.normal(jax.random.PRNGKey(1), (Nc, D)) * 50).astype(dtype)
        )()
        for d in (0.95, 0.8, 0.5, 0.2):
            ids = sorted_ids(rng, d, 8192, n=Nc)
            got = local_take_sorted(tab, jnp.asarray(ids), density=d)
            ref = jnp.take(tab, jnp.asarray(ids), axis=0)
            ok = np.array_equal(np.asarray(got), np.asarray(ref))
            print(f"correct {np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name} d={d}: {ok}", flush=True)
        # pathological: huge jumps (all miss)
        ids = np.sort(rng.randint(0, Nc, 8192)).astype(np.int32)
        got = local_take_sorted(tab, jnp.asarray(ids), density=1.0)
        ref = jnp.take(tab, jnp.asarray(ids), axis=0)
        print(f"correct allmiss: {np.array_equal(np.asarray(got), np.asarray(ref))}", flush=True)

    # --- perf ---
    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()

    def bench(tag, d, **kw):
        ids_list = [jnp.asarray(sorted_ids(rng, d, B)) for _ in range(4)]

        def step(i, tab):
            ids = jax.lax.switch(i % 4, [lambda x=x: x for x in ids_list])
            return local_take_sorted(tab, ids, density=d, **kw)[0, 0]

        # warm up measure_chain once to flush one-time costs
        dt = measure_chain(step, 8, table)
        dt = min(dt, measure_chain(step, 8, table))
        print(f"{tag}: {B*D*4/dt/1e9:.1f} GB/s ({dt*1e3:.2f} ms)", flush=True)

    for d in (0.95, 0.8, 0.5):
        t, w, g, ws = _window_plan(d, None, None)
        print(f"plan d={d}: tile={t} win={w} g={g} wsub={ws}", flush=True)
        bench(f"default d={d}", d)
    # wsub / window slack sweep at the bench density 0.8
    for ws in (192, 224, 256):
        for extra in (0, 64, 128):
            t, w, g, _ = _window_plan(0.8, None, None)
            bench(f"d=0.8 wsub={ws} win={w+extra}", 0.8, wsub=ws, window=w + extra)
    # group sweep at d=0.8
    for g in (4, 8, 16):
        bench(f"d=0.8 group={g}", 0.8, group=g)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

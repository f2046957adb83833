"""Final validation of local_take_sorted with the int8 4-plane select,
statistical window plan, and ring self-dispatch.

1. Correctness (exact vs take) at d in {0.95, 0.8, 0.5, 0.2} + all-miss,
   f32 (int8 select + repairs) and bf16, plus extreme values (NaN, Inf,
   -0.0, denormals) in the f32 table.
2. Perf: default plan at d in {0.95, 0.8, 0.6, 0.5}, median of 3 chains.

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_lts_v3.py > /tmp/exp_lts_v3.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import _window_plan, local_take_sorted
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

    Nc = 200_000
    for dtype in (jnp.float32, jnp.bfloat16):
        base = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (Nc, D)) * 50
        ).astype(np.float32)
        if dtype == jnp.float32:
            # splash extreme bit patterns through the table
            base[::97, 0] = np.nan
            base[::101, 1] = np.inf
            base[::103, 2] = -0.0
            base[::107, 3] = np.float32(1e-42)  # denormal
        tab = jnp.asarray(base, dtype=dtype)
        for d in (0.95, 0.8, 0.5, 0.2):
            ids = sorted_ids(rng, d, 8192, n=Nc)
            got = np.asarray(local_take_sorted(tab, jnp.asarray(ids), density=d))
            ref = np.asarray(jnp.take(tab, jnp.asarray(ids), axis=0))
            ok = np.array_equal(
                got.view(np.uint8 if dtype == jnp.float32 else np.uint8),
                ref.view(np.uint8),
            )
            print(f"correct {np.dtype(dtype).name} d={d}: {ok}", flush=True)
        ids = np.sort(rng.randint(0, Nc, 8192)).astype(np.int32)
        got = np.asarray(local_take_sorted(tab, jnp.asarray(ids), density=1.0))
        ref = np.asarray(jnp.take(tab, jnp.asarray(ids), axis=0))
        print(
            f"correct allmiss {np.dtype(dtype).name}: "
            f"{np.array_equal(got.view(np.uint8), ref.view(np.uint8))}",
            flush=True,
        )

    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()
    for d in (0.8, 0.95, 0.6, 0.5):
        t, w, g, ws = _window_plan(d, None, None)
        ids_list = [jnp.asarray(sorted_ids(rng, d, B)) for _ in range(4)]

        def step(i, tab):
            ids = jax.lax.switch(i % 4, [lambda x=x: x for x in ids_list])
            return local_take_sorted(tab, ids, density=d)[0, 0]

        dts = sorted(measure_chain(step, 8, table) for _ in range(3))
        dt = dts[1]
        print(
            f"d={d} (win={w} wsub={ws}): {B*D*4/dt/1e9:.1f} GB/s "
            f"({dt*1e3:.2f} ms)  [all: {', '.join(f'{x*1e3:.2f}' for x in dts)}]",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

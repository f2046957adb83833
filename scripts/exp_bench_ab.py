"""A/B the bench_gather_sorted discrepancy: full local_take_sorted measured
2.78 ms at win=1408 (exp_lts_v3) but bench.py at win=1376 printed 5.21 ms.
Variables: window 1376 vs 1408 (1408 % 128 == 0), 10-list vs 4-list switch.

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_bench_ab.py > /tmp/exp_ab.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import local_take_sorted
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 8


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    span = min(N, int(B * 1.25))
    base = rng.randint(0, N - span, size=iters + 2)
    lists = [
        jnp.asarray(np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32))
        for b in base
    ]
    d = B / span
    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()

    def run(tag, ids_list, **kw):
        def step(i, tab):
            ids = jax.lax.switch(
                i % len(ids_list), [lambda x=x: x for x in ids_list]
            )
            return local_take_sorted(tab, ids, density=d, **kw)[0, 0]

        dts = sorted(measure_chain(step, iters, table) for _ in range(3))
        print(
            f"{tag}: {B*D*4/dts[1]/1e9:.1f} GB/s  "
            f"[{', '.join(f'{x*1e3:.2f}' for x in dts)} ms]",
            flush=True,
        )

    run("win=1376 lists=10", lists, window=1376, wsub=224)
    run("win=1408 lists=10", lists, window=1408, wsub=224)
    run("win=1376 lists=4", lists[:4], window=1376, wsub=224)
    run("win=1408 lists=4", lists[:4], window=1408, wsub=224)
    run("win=1536 lists=10", lists, window=1536, wsub=224)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Same-session A/B: window slab split=1 vs split=4 (and bench-exact
local_take_sorted), interleaved in one chain each, 3 chains, to settle
whether exp_window_reuse2's "f32 split4 211.7 GB/s" was a real win or
cross-session tunnel variance (bench r4 measured 196.8 with split4 ~= r3's
196.3 with split1).

  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_split_ab.py > /tmp/exp_split_ab.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wholegraph_tpu.ops.gather_pallas import gather_rows_window, local_take_sorted
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 8


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (N, D), jnp.float32)
    )()
    span = int(B / 0.8)
    lists = [
        jnp.asarray(np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32))
        for b in rng.randint(0, N - span, size=6)
    ]
    kw = dict(tile=128, group=8, window=1408, wsub=224)

    def mk(fn, **k):
        def step(i, tab):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fn(tab, ids, **k)[0, 0]
        return step

    variants = [
        ("split1", mk(gather_rows_window, splits=1, **kw)),
        ("split4", mk(gather_rows_window, splits=4, **kw)),
        ("split2", mk(gather_rows_window, splits=2, **kw)),
        ("lts(default)", mk(local_take_sorted, density=0.8)),
    ]
    acc = {t: [] for t, _ in variants}
    for rep in range(3):
        for tag, step in variants:
            dt = measure_chain(step, iters, table)
            acc[tag].append(dt)
            print(f"rep{rep} {tag}: {B * D * 4 / dt / 1e9:.1f} GB/s "
                  f"({dt*1e3:.2f} ms)", flush=True)
    for tag, dts in acc.items():
        m = sorted(dts)[1]
        print(f"MEDIAN {tag}: {B * D * 4 / m / 1e9:.1f} GB/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

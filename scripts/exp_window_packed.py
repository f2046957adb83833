"""A/B the packed-byte-planes window select (VERDICT r2 item 6): 4 separate
[tile, wsub] @ [wsub, D] int8 plane matmuls vs ONE [tile, wsub] @ [wsub, 4D]
matmul.  Same flops; the packed form streams the weight operand once per
sub-tile with a 4x larger N dim (the select is weight-reload-bound at ~25%
MXU util).  Run on hardware:

  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_window_packed.py > /tmp/exp_packed.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import gather_rows_window
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 6


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()

    for d in (0.95, 0.8):
        span = int(B / d)
        lists = [
            jnp.asarray(
                np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32)
            )
            for b in rng.randint(0, N - span, size=6)
        ]
        kw = dict(tile=128, group=8, window=1408, wsub=224)

        # correctness first (once, on-device compare)
        a = gather_rows_window(table, lists[0], pack_planes=False, **kw)
        b = gather_rows_window(table, lists[0], pack_planes=True, **kw)
        same = bool(jnp.array_equal(a, b))
        print(f"d={d} packed == unpacked: {same}", flush=True)

        for tag, packed in (("unpacked", False), ("packed", True)):
            def step(i, tab, lists=lists, packed=packed):
                ids = jax.lax.switch(
                    i % len(lists), [lambda x=x: x for x in lists]
                )
                return gather_rows_window(
                    tab, ids, pack_planes=packed, **kw
                )[0, 0]

            dts = sorted(measure_chain(step, iters, table) for _ in range(3))
            print(
                f"d={d} {tag}: {B*D*4/dts[1]/1e9:.1f} GB/s "
                f"[{', '.join(f'{x*1e3:.2f}' for x in dts)} ms]",
                flush=True,
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 window ladder part 3: calibrate the machine's aggregate HBM rate
(pure XLA copy) and amortize per-step overhead with bigger steps
(group 16/32), planes layout, split 4.

  nohup env PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site python \
    scripts/exp_window_reuse3.py > /tmp/exp_reuse3.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from exp_window_reuse import make_plane_table
from exp_window_reuse2 import gather_split
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 6


def run(tag, fn, *args, bytes_moved=None):
    try:
        dts = sorted(measure_chain(fn, iters, *args) for _ in range(3))
        gb = (bytes_moved or B * D * 4) / dts[1] / 1e9
        print(f"{tag}: {gb:.1f} GB/s [{', '.join(f'{x*1e3:.2f}' for x in dts)} ms]",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (N, D), jnp.float32)
    )()
    planes = jax.jit(make_plane_table)(table)
    d = 0.8
    span = int(B / d)
    lists = [
        jnp.asarray(np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32))
        for b in rng.randint(0, N - span, size=6)
    ]

    # HBM copy calibration: contiguous 512 MB slice copy (read+write = 1 GB)
    M = (1 << 29) // (D * 4)

    def copy_step(i, tab):
        sl = lax.dynamic_slice(tab, (i % 4 * 1024, 0), (M, D))
        out = sl * 1.0000001
        return out[0, 0]

    run("XLA copy 512MB slice (r+w)", copy_step, table,
        bytes_moved=2 * M * D * 4)

    def mk(fn, **kw):
        def step(i, tab):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fn(tab, ids, **kw)[0, 0]
        return step

    # bigger steps: group 16 window 2816 wsub 224; group 32 window 5504
    run("planes g16 win2816 split4",
        mk(gather_split, tile=128, group=16, window=2816, wsub=224, splits=4),
        planes)
    run("planes g32 win5504 split4",
        mk(gather_split, tile=128, group=32, window=5504, wsub=224, splits=4),
        planes)
    run("DIAG fetch-only g16 split4",
        mk(gather_split, tile=128, group=16, window=2816, wsub=224, splits=4,
           mode="fetch_only"), planes)
    run("DIAG fetch-only g32 split4",
        mk(gather_split, tile=128, group=32, window=5504, wsub=224, splits=4,
           mode="fetch_only"), planes)
    run("planes g16 win2816 split4 slots3",
        mk(gather_split, tile=128, group=16, window=2816, wsub=224, splits=4,
           slots=3), planes)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

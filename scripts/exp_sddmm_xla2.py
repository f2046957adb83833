"""XLA chunked SDDMM on the sddmm_clustered bench shape — the bar the
windowed kernel must beat to stay the dw path (r5b: both windowed modes
measured 7.2-7.3 Medges/s; per-edge takes are descriptor-bound ~40).

Run: nohup python scripts/exp_sddmm_xla2.py > artifacts/exp_sddmm_xla2.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.spmm import sddmm_chunked
from wholegraph_tpu.utils.perf import measure_chain

n, deg, dim, width = 1 << 20, 16, 256, 192
rs = np.random.RandomState(0)
counts = rs.randint(max(deg // 2, 1), deg * 2, n)
row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
E = int(row_ptr[-1])
col = (
    np.repeat(np.arange(n), counts)
    + rs.randint(-width // 2, width // 2 + 1, E)
).clip(0, n - 1).astype(np.int32)
dst = np.repeat(np.arange(n), counts).astype(np.int32)
print(f"n={n} E={E}", flush=True)
col_d, dst_d = jnp.asarray(col), jnp.asarray(dst)
a = jax.jit(lambda: jnp.ones((n, dim), jnp.float32))()


def step(i, col_d, dst_d, a):
    e = sddmm_chunked(col_d, dst_d, a * (1.0 + i * 0.0), a)
    return e[0]


dts = sorted(measure_chain(step, 6, col_d, dst_d, a) for _ in range(3))
dt = dts[1]
print(f"XLA chunked sddmm: {E / dt / 1e6:.1f} Medges/s ({dt*1e3:.1f} ms)",
      flush=True)
print("done", flush=True)

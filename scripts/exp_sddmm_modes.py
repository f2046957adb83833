"""r5b SDDMM select-mode A/B on silicon: 'exact' (4x int8 byte-plane
selects + bitwise reassembly) vs 'split2' (2x bf16 hi+lo selects) — the
rewritten double-byte-plane kernel measured 7.2 Medges/s, far off the
~40ns/edge MXU model; isolate whether the selects or the surrounding
VPU/bookkeeping dominate, and the split2 accuracy.

Run: nohup python scripts/exp_sddmm_modes.py > artifacts/exp_sddmm_modes.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.spmm import plan_spmm_tiles
from wholegraph_tpu.ops.spmm_pallas import sddmm_window
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
tile = 256
window, edge_cap, feasible = plan_spmm_tiles(row_ptr, col, tile=tile)
print(f"n={n} E={E} window={window} edge_cap={edge_cap} feas={feasible}",
      flush=True)
rp_d, col_d = jnp.asarray(row_ptr), jnp.asarray(col)
a = jax.jit(lambda k: jax.random.normal(jax.random.PRNGKey(k), (n, dim)))(0)
b = jax.jit(lambda k: jax.random.normal(jax.random.PRNGKey(k), (n, dim)))(1)


def med(step, iters, *args, runs=3):
    return sorted(measure_chain(step, iters, *args) for _ in range(runs))[runs // 2]


for mode in ("exact", "split2"):
    def step(i, rp_d, col_d, a, b):
        e = sddmm_window(rp_d, col_d, a * (1.0 + i * 0.0), b,
                         window=window, edge_cap=edge_cap, tile=tile,
                         select_mode=mode)
        return e[0]

    dt = med(step, 6, rp_d, col_d, a, b)
    print(f"sddmm mode={mode}: {dt*1e3:.2f} ms = {E/dt/1e6:.1f} Medges/s",
          flush=True)

# accuracy of split2 vs exact on a small slice
f_ex = jax.jit(lambda a, b: sddmm_window(
    rp_d, col_d, a, b, window=window, edge_cap=edge_cap, tile=tile,
    select_mode="exact"))
f_sp = jax.jit(lambda a, b: sddmm_window(
    rp_d, col_d, a, b, window=window, edge_cap=edge_cap, tile=tile,
    select_mode="split2"))
e_ex = np.asarray(f_ex(a, b)[:100000]).astype(np.float64)
e_sp = np.asarray(f_sp(a, b)[:100000]).astype(np.float64)
denom = np.maximum(np.abs(e_ex), 1e-6)
rel = np.abs(e_sp - e_ex) / denom
print(f"split2 vs exact rel err: max={rel.max():.3e} p99={np.percentile(rel, 99):.3e}",
      flush=True)
print("done", flush=True)

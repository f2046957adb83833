"""Chain-timed spmm_window matrix over (n, D, weighted, group_dot): resolve
the r5b anomaly — the clustered bench chain-times 322 Medges/s at n=1M
D=256 unweighted, but the GAT decomp eager-timed the same kernel at
~14-28 at n=256K D=128, and the invariant-chain GAT isolation implied
~24 Medges/s per weighted kernel at n=1M D=128.

Run: nohup python scripts/exp_spmm_matrix.py > artifacts/exp_spmm_matrix.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import wholegraph_tpu.ops.spmm_pallas as SP
from wholegraph_tpu.ops.spmm import plan_spmm_tiles
from wholegraph_tpu.ops.spmm_pallas import spmm_window
from wholegraph_tpu.utils.perf import measure_chain


def graph(n, deg=16, width=192):
    rs = np.random.RandomState(0)
    counts = rs.randint(deg // 2, deg * 2, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (np.repeat(np.arange(n), counts)
           + rs.randint(-width // 2, width // 2 + 1, E)).clip(0, n - 1).astype(np.int32)
    return jnp.asarray(rp), jnp.asarray(col), E


def med(step, iters, *args, runs=3):
    return sorted(measure_chain(step, iters, *args) for _ in range(runs))[runs // 2]


for n in (1 << 18, 1 << 20):
    rp, col, E = graph(n)
    window, edge_cap, feas = plan_spmm_tiles(np.asarray(rp), np.asarray(col), tile=256)
    print(f"n={n} E={E} window={window} edge_cap={edge_cap}", flush=True)
    for D in (128, 256):
        x = jnp.ones((n, D), jnp.float32)
        w = jnp.ones((E,), jnp.float32)
        for tag, kw in (
            ("unw", {}),
            ("w-split2", dict(edge_weight=w, weight_grad=False,
                              weight_precision="split2")),
        ):
            for gd in (False, True):
                SP._GROUP_DOT = gd

                def step(i, x):
                    o = spmm_window(rp, col, x * (1.0 + i * 0.0),
                                    window=window, edge_cap=edge_cap,
                                    reduce="sum", **kw)
                    return o[0, 0]

                dt = med(step, 6, x)
                print(f"  D={D} {tag} group_dot={int(gd)}: {dt*1e3:.2f} ms "
                      f"= {E/dt/1e6:.1f} Medges/s", flush=True)
print("done", flush=True)

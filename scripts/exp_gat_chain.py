"""Bisect the gat_layer TPU-worker crash #2 (r5): eager GAT fwd passes at
n=1M (exp_gat_bisect.py) but the bench's measure_chain (fori_loop of steps
with loop-variant feats) kills the worker.  Isolate: eager-repeat vs chain,
loop-variant vs loop-invariant feats, n ladder, fused sub-paths.

Run AFTER any other TPU job finishes (a worker crash poisons later runs):
nohup python scripts/exp_gat_chain.py > artifacts/exp_gat_chain.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.models.conv import GATConv
from wholegraph_tpu.utils.perf import measure_chain


def clustered(n, deg=16, width=192, seed=0):
    rs = np.random.RandomState(seed)
    counts = rs.randint(deg // 2, deg * 2, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (np.repeat(np.arange(n), counts)
           + rs.randint(-width // 2, width // 2 + 1, E)
           ).clip(0, n - 1).astype(np.int32)
    return rp, col, E


def stage(name, fn):
    print(f"--- {name}", flush=True)
    try:
        r = fn()
        print(f"    OK {r}", flush=True)
        return True
    except Exception as e:
        print(f"    FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False


for n in (1 << 17, 1 << 20):
    rp, col, E = clustered(n)
    g = GraphStructure(row_ptr=jnp.asarray(rp), col=jnp.asarray(col),
                       node_count=n, edge_count=E, max_degree=32)
    fg = g.to_full_graph(windowed=True)
    print(f"n={n} E={E} window={fg.window} edge_cap={fg.edge_cap}", flush=True)
    feats = jax.jit(lambda: jnp.ones((n, 256), jnp.float32))()
    layer = GATConv(out_dim=64, num_heads=4)
    params = layer.init(jax.random.PRNGKey(0), feats, fg)

    # (a) jit eager, repeated 8x (same compiled program, fresh inputs)
    f = jax.jit(lambda p, x: layer.apply(p, x, fg)[0, 0])
    ok = stage("eager-jit x8", lambda: [float(f(params, feats)) for _ in range(8)][-1])
    if not ok:
        break

    # (b) chain, loop-INVARIANT feats (steps differ only via the barrier)
    def step_inv(i, p, x):
        return layer.apply(p, x, fg)[0, 0] + 0.0 * i

    ok = stage("chain feats-invariant", lambda: measure_chain(step_inv, 8, params, feats))
    if not ok:
        break

    # (c) chain, loop-variant feats (the bench's exact form)
    def step_var(i, p, x):
        return layer.apply(p, x * (1.0 + i * 0.0), fg)[0, 0]

    ok = stage("chain feats-variant (bench form)", lambda: measure_chain(step_var, 8, params, feats))
    if not ok:
        break

print("gat chain bisect done", flush=True)

"""Reproduce the spmm_sampled windowed compile failure with FULL stderr
(the bench's tail -3 swallowed it).  Builds the exact bench shapes and
compiles padded_reduce_windowed alone.

Run: nohup python scripts/exp_sampled_compile.py > artifacts/exp_sampled_compile.log 2>&1 &
"""
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.ops.spmm import padded_reduce_windowed

n, deg, width, batch, fanouts = 2_000_000, 16, 192, 1024, (10, 15)
rs = np.random.RandomState(0)
counts = rs.randint(max(deg // 2, 1), deg * 2, n)
rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
E = int(rp[-1])
col = (
    np.repeat(np.arange(n), counts)
    + rs.randint(-width // 2, width // 2 + 1, E)
).clip(0, n - 1).astype(np.int32)
g = GraphStructure(row_ptr=jnp.asarray(rp), col=jnp.asarray(col),
                   node_count=n, edge_count=E, max_degree=int(counts.max()))
centers = jnp.asarray(np.sort(rs.choice(n, batch, replace=False)).astype(np.int32))
ml = jax.jit(lambda c: g.multilayer_sample(c, list(fanouts), seed=1))(centers)
L = len(fanouts) - 1
hop = ml.hops[L]
U = int(ml.unique_gids.shape[0])
rb = ml.run_bounds(L)
wins = tuple(min(-(-min(b2 - b1, 2048) // 128) * 128, 2048)
             for b1, b2 in zip(rb, rb[1:]))
print(f"U={U} B={hop.nbr_idx.shape} rb={rb} wins={wins}", flush=True)
x = jnp.ones((U, 256), jnp.float32)

try:
    f = jax.jit(lambda x: padded_reduce_windowed(
        x, hop.nbr_idx, hop.mask, "mean", run_bounds=rb, windows=wins))
    out = f(x)
    print("OK", float(out[0, 0]), flush=True)
except Exception:
    traceback.print_exc()
    # second attempt with smaller windows to find the compiling size
    for cap in (1024, 512):
        wins2 = tuple(min(w, cap) for w in wins)
        try:
            f2 = jax.jit(lambda x: padded_reduce_windowed(
                x, hop.nbr_idx, hop.mask, "mean", run_bounds=rb,
                windows=wins2))
            out = f2(x)
            print(f"OK at cap {cap}", float(out[0, 0]), flush=True)
            break
        except Exception as e:
            print(f"cap {cap}: {type(e).__name__}: {str(e)[:400]}", flush=True)
print("done", flush=True)

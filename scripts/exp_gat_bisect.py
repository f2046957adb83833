"""Bisect the gat_layer TPU-worker crash (r5 sweep, n=1M):
isolate weighted spmm_window at scale, then the GAT layer at rising n."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

def clustered(n, deg=16, width=192, seed=0):
    rs = np.random.RandomState(seed)
    counts = rs.randint(deg // 2, deg * 2, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (np.repeat(np.arange(n), counts)
           + rs.randint(-width // 2, width // 2 + 1, E)).clip(0, n - 1).astype(np.int32)
    return rp, col, E

from wholegraph_tpu.ops.spmm import plan_spmm_tiles
from wholegraph_tpu.ops.spmm_pallas import spmm_window

for n in (1 << 17, 1 << 20):
    rp, col, E = clustered(n)
    window, edge_cap, feas = plan_spmm_tiles(rp, col, tile=256)
    print(f"n={n} E={E} window={window} edge_cap={edge_cap}", flush=True)
    x = jnp.ones((n, 128), jnp.float32)
    w = jnp.ones((E,), jnp.float32)
    try:
        out = spmm_window(jnp.asarray(rp), jnp.asarray(col), x,
                          window=window, edge_cap=edge_cap, reduce="sum",
                          edge_weight=w)
        print(f"  weighted D=128: OK sum={float(out.sum()):.1f}", flush=True)
    except Exception as e:
        print(f"  weighted D=128: FAIL {type(e).__name__}: {e}", flush=True)
        break

from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.models.conv import GATConv

for n in (1 << 17, 1 << 19, 1 << 20):
    rp, col, E = clustered(n)
    g = GraphStructure(row_ptr=jnp.asarray(rp), col=jnp.asarray(col),
                       node_count=n, edge_count=E, max_degree=32)
    fg = g.to_full_graph(windowed=True)
    print(f"GAT n={n} E={E} window={fg.window} edge_cap={fg.edge_cap}", flush=True)
    feats = jnp.ones((n, 256), jnp.float32)
    layer = GATConv(out_dim=64, num_heads=4)
    try:
        params = layer.init(jax.random.PRNGKey(0), feats, fg)
        out = layer.apply(params, feats, fg)
        print(f"  GAT fwd: OK {float(jnp.sum(out[0])):.3f}", flush=True)
    except Exception as e:
        print(f"  GAT fwd: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        break
print("bisect done", flush=True)

"""Decompose the fused GAT forward's time on silicon (r5b: eager fused fwd
measured ~10 s at E=20M = 487 ns/edge — the 4 weighted kernels alone were
~3.3 s in the invariant-chain isolation, so ~6+ s is XLA-side).  Time each
stage separately at n=256K, then the full layer and the per-edge XLA path.

Run: nohup python scripts/exp_gat_decomp.py > artifacts/exp_gat_decomp.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.models.conv import GATConv
from wholegraph_tpu.ops.spmm_pallas import spmm_window

n, deg, width, H, Dh = 1 << 18, 16, 192, 4, 64
rs = np.random.RandomState(0)
counts = rs.randint(deg // 2, deg * 2, n)
rp_np = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
E = int(rp_np[-1])
col_np = (np.repeat(np.arange(n), counts)
          + rs.randint(-width // 2, width // 2 + 1, E)).clip(0, n - 1).astype(np.int32)
g = GraphStructure(row_ptr=jnp.asarray(rp_np), col=jnp.asarray(col_np),
                   node_count=n, edge_count=E, max_degree=int(counts.max()))
fg = g.to_full_graph(windowed=True)
print(f"n={n} E={E} window={fg.window} edge_cap={fg.edge_cap}", flush=True)
feats = jax.jit(lambda: jnp.ones((n, H * Dh), jnp.float32))()
layer = GATConv(out_dim=Dh, num_heads=H)
params = layer.init(jax.random.PRNGKey(0), feats, fg)

rp, src = fg.row_ptr, fg.edge_src
edge_dst = jnp.asarray(np.repeat(np.arange(n), counts).astype(np.int32))
e_n = jax.jit(lambda k: jax.random.normal(jax.random.PRNGKey(k), (n, H)))(0)
alpha = jax.jit(lambda k: jax.random.uniform(jax.random.PRNGKey(k), (E, H)))(1)
xh = jax.jit(lambda: jnp.ones((n, 128), jnp.float32))()


def timeit(name, f, *args, iters=4):
    float(jnp.asarray(f(*args)).reshape(-1)[0])  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(jnp.asarray(f(*args)).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms ({E/dt/1e6:.1f} Medges/s)", flush=True)
    return dt


# (a) logits + edge-softmax only (the fused path's XLA stage)
@jax.jit
def softmax_only(e_n):
    logits = nn.leaky_relu(
        jnp.take(e_n, src, axis=0, mode="clip")
        + jnp.take(e_n, edge_dst, axis=0, mode="clip"), negative_slope=0.2)
    mx = jax.ops.segment_max(logits, edge_dst, num_segments=n,
                             indices_are_sorted=True)
    z = jnp.exp(logits - jnp.take(mx, edge_dst, axis=0, mode="clip"))
    den = jax.ops.segment_sum(z, edge_dst, num_segments=n,
                              indices_are_sorted=True)
    a = z / jnp.maximum(jnp.take(den, edge_dst, axis=0, mode="clip"), 1e-16)
    return a[0, 0] + a[-1, -1]


timeit("logits+edge-softmax (XLA)", softmax_only, e_n)


# (b) ONE weighted windowed spmm, split2
@jax.jit
def one_spmm(xh, alpha):
    o = spmm_window(rp, src, xh, window=fg.window, edge_cap=fg.edge_cap,
                    reduce="sum", edge_weight=alpha[:, 0],
                    weight_grad=False, weight_precision="split2")
    return o[0, 0]


timeit("1x weighted spmm_window split2", one_spmm, xh, alpha)


# (b2) highest for the A/B
@jax.jit
def one_spmm_hi(xh, alpha):
    o = spmm_window(rp, src, xh, window=fg.window, edge_cap=fg.edge_cap,
                    reduce="sum", edge_weight=alpha[:, 0], weight_grad=False)
    return o[0, 0]


timeit("1x weighted spmm_window highest", one_spmm_hi, xh, alpha)


# (b3) unweighted for reference
@jax.jit
def one_spmm_unw(xh):
    o = spmm_window(rp, src, xh, window=fg.window, edge_cap=fg.edge_cap,
                    reduce="sum")
    return o[0, 0]


timeit("1x unweighted spmm_window", one_spmm_unw, xh)

# (c) full fused layer fwd
f_fused = jax.jit(lambda p, x: layer.apply(p, x, fg)[0, 0])
timeit("full fused GAT fwd", f_fused, params, feats)

# (d) per-edge XLA path
fg_x = g.to_full_graph(windowed=False)
f_xla = jax.jit(lambda p, x: layer.apply(p, x, fg_x)[0, 0])
timeit("full XLA GAT fwd", f_xla, params, feats)
print("done", flush=True)

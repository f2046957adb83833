"""r5b uniform-sampler A/B: pallas lane select + slab-DMA col fetch vs the
r5a XLA one-hot + per-block fetch (the ladder showed col fetch at 4.09 ms of
the 5.06 ms step, consistent with the [B, K, span] one-hot materialising
~1 GB in HBM — exp_uniform_ladder.py).

Run: nohup python scripts/exp_uniform_select.py > artifacts/exp_uniform_select.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops import sampling as S
from wholegraph_tpu.utils.perf import measure_chain

B, K, MAXDEG = 1 << 16, 15, 65536
N, DEG = 2_000_000, 16

rs = np.random.RandomState(1)
degs = rs.randint(DEG // 2, DEG + DEG // 2 + 1, N)
rp_np = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
E = int(rp_np[-1])
col = jnp.asarray(rs.randint(0, N, E).astype(np.int32))
rp = jnp.asarray(rp_np.astype(np.int32))
centers0 = jax.jit(lambda: jax.random.randint(
    jax.random.PRNGKey(0), (B,), 0, N, dtype=jnp.int32))()

print(f"honest CSR: N={N} E={E} B={B} K={K}", flush=True)


def med(step, iters, *args, runs=3):
    return sorted(measure_chain(step, iters, *args) for _ in range(runs))[runs // 2]


def full(i, col):
    res = S.csr_sample_neighbors(rp, col, centers0 + i * 0, K, seed=0,
                                 max_degree=MAXDEG)
    return res.neighbors[0, 0].astype(jnp.float32)


start0, _ = S._fetch_ptr_pairs(rp, centers0)
deg0 = jnp.asarray(degs, jnp.int32)[centers0]
pos0, mask0 = jax.jit(
    lambda d: S._sample_positions_uniform(d, K, 0, centers0, 0)
)(deg0)


def colfetch(i, col):
    out = S._fetch_cols(col, start0, deg0 + i * 0, pos0, mask0, MAXDEG)
    return out[0, 0].astype(jnp.float32)


for sel, slab in ((False, False), (True, False), (False, True), (True, True)):
    S._SELECT_PALLAS, S._SLAB_FETCH = sel, slab
    dtc = med(colfetch, 8, col)
    dtf = med(full, 8, col)
    print(
        f"select_pallas={int(sel)} slab={int(slab)}: col fetch {dtc*1e3:.3f} ms"
        f", full step {dtf*1e3:.3f} ms = {B*K/dtf/1e6:.1f} Medges/s",
        flush=True,
    )

# correctness cross-check on silicon: all four configs bit-equal
S._SELECT_PALLAS, S._SLAB_FETCH = False, False
ref = jax.jit(lambda c: S.csr_sample_neighbors(
    rp, c, centers0, K, seed=0, max_degree=MAXDEG).neighbors)(col)
for sel, slab in ((True, False), (False, True), (True, True)):
    S._SELECT_PALLAS, S._SLAB_FETCH = sel, slab
    got = jax.jit(lambda c: S.csr_sample_neighbors(
        rp, c, centers0, K, seed=0, max_degree=MAXDEG).neighbors)(col)
    eq = bool(jnp.all(got == ref))
    print(f"bitequal select={int(sel)} slab={int(slab)}: {eq}", flush=True)
print("done", flush=True)

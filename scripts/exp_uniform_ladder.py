"""Uniform sampler cost ladder (VERDICT r4 #5): decompose the honest-CSR
uniform sampling step into its phases on silicon and A/B the candidate
levers — (a) a 2-block single-shot col fetch (the dispatch currently jumps
from the 1-block fast path straight to the 4-block ladder), (b) a
j+1-iteration positions fixpoint (slot j's rank-adjust converges in <= j+1
steps; the code runs K for every slot).

Run: nohup python scripts/exp_uniform_ladder.py > artifacts/exp_uniform.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops import sampling as S
from wholegraph_tpu.ops import rng
from wholegraph_tpu.utils.perf import measure_chain

B, K, MAXDEG = 1 << 16, 15, 65536
N, DEG = 2_000_000, 16


def honest_csr():
    rs = np.random.RandomState(1)
    degs = rs.randint(DEG // 2, DEG + DEG // 2 + 1, N)
    rp = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    E = int(rp[-1])
    col = rs.randint(0, N, E).astype(np.int32)
    return jnp.asarray(rp.astype(np.int32)), jnp.asarray(col), int(degs.max())


def med(step, iters, *args, runs=3):
    return sorted(measure_chain(step, iters, *args) for _ in range(runs))[runs // 2]


rp, col, true_max = honest_csr()
centers0 = jax.jit(lambda: jax.random.randint(
    jax.random.PRNGKey(0), (B,), 0, N, dtype=jnp.int32))()

print(f"honest CSR: N={N} E={col.shape[0]} true_max={true_max} B={B} K={K}", flush=True)

# --- phase 0: full step (baseline) ---
def full(i, col):
    res = S.csr_sample_neighbors(rp, col, centers0 + i * 0, K, seed=0,
                                 max_degree=MAXDEG)
    return res.neighbors[0, 0].astype(jnp.float32)

dt = med(full, 8, col)
print(f"full step: {dt*1e3:.3f} ms = {B*K/dt/1e6:.1f} Medges/s", flush=True)

# --- phase 1: ptr pair fetch only ---
def ptrs(i, col):
    d0, d1 = S._fetch_ptr_pairs(rp, centers0 + i * 0)
    return (d0[0] + d1[0]).astype(jnp.float32)

dt1 = med(ptrs, 8, col)
print(f"ptr-pair fetch: {dt1*1e3:.3f} ms", flush=True)

# --- phase 2: positions fixpoint only (K fix iterations, current) ---
start0, end0 = S._fetch_ptr_pairs(rp, centers0)
deg0 = (end0 - start0).astype(jnp.int32)

def positions(i, deg):
    pos, mask = S._sample_positions_uniform(deg + i * 0, K, 0, centers0, 0)
    return pos[0, 0].astype(jnp.float32)

dt2 = med(positions, 8, deg0)
print(f"positions fixpoint (current): {dt2*1e3:.3f} ms", flush=True)

# --- phase 3: col fetch only (current dispatch) ---
pos0, mask0 = jax.jit(
    lambda d: S._sample_positions_uniform(d, K, 0, centers0, 0)
)(deg0)

def colfetch(i, col):
    out = S._fetch_cols(col, start0, deg0 + i * 0, pos0, mask0, MAXDEG)
    return out[0, 0].astype(jnp.float32)

dt3 = med(colfetch, 8, col)
print(f"col fetch (current dispatch): {dt3*1e3:.3f} ms", flush=True)
print(f"sum of phases: {(dt1+dt2+dt3)*1e3:.3f} ms vs full {dt*1e3:.3f}", flush=True)

# --- A/B: nb-block single-shot col fetch variants ---
from wholegraph_tpu.ops.gather_pallas import _gather_rows_pallas3_impl

E = col.shape[0]
pad_e = -E % 128
c2 = jnp.concatenate([col, jnp.zeros((pad_e,), col.dtype)]).reshape(-1, 128)
nblk_tab = c2.shape[0]
blk0 = start0 >> 7
s_lane = (start0 & 127).astype(jnp.int32)
eidx = s_lane[:, None] + jnp.where(mask0, pos0, 0)

def make_nb(nb):
    def f(i, c2):
        bids = blk0[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
        fl = jnp.clip(bids, 0, nblk_tab - 1).reshape(-1) + i * 0
        pad_m = -fl.shape[0] % 1024
        if pad_m:
            fl = jnp.concatenate([fl, jnp.zeros((pad_m,), fl.dtype)])
        lanes = _gather_rows_pallas3_impl(c2, fl)[: B * nb].reshape(B, nb * 128)
        onehot = eidx[:, :, None] == jnp.arange(nb * 128, dtype=jnp.int32)[None, None, :]
        sel = jnp.sum(jnp.where(onehot, lanes[:, None, :], 0), axis=2)
        return sel[0, 0].astype(jnp.float32)
    return f

for nb in (1, 2, 4):
    dtn = med(make_nb(nb), 8, c2)
    cover = float(jnp.mean((s_lane + jnp.maximum(deg0, 1) <= nb * 128)))
    print(f"nb={nb} single-shot col fetch: {dtn*1e3:.3f} ms (covers {cover:.3f} of batch)", flush=True)

# --- A/B: j+1-iteration fixpoint ---
def positions_j1(i, deg):
    dd = deg + i * 0
    sentinel = jnp.int32(1 << 30)
    sel0 = jnp.full((B, K), sentinel, jnp.int32)

    def body(j, sel):
        nj = jnp.maximum(dd - j, 1)
        r = rng.randint(0, centers0, 0 * S._HOP_STRIDE + j, nj)

        def fix(_, p):
            cnt = jnp.sum((sel <= p[:, None]).astype(jnp.int32), axis=1)
            return r + cnt

        p = jax.lax.fori_loop(0, j + 1, fix, r)
        return sel.at[:, j].set(p)

    sel = jax.lax.fori_loop(0, K, body, sel0)
    return sel[0, 0].astype(jnp.float32)

dt2b = med(positions_j1, 8, deg0)
print(f"positions fixpoint (j+1 iters): {dt2b*1e3:.3f} ms", flush=True)

# bit-equality of the j+1 fixpoint
pos_a, _ = jax.jit(lambda d: S._sample_positions_uniform(d, K, 0, centers0, 0))(deg0)
sentinel = jnp.int32(1 << 30)


@jax.jit
def pos_j1(dd):
    sel0 = jnp.full((B, K), sentinel, jnp.int32)

    def body(j, sel):
        nj = jnp.maximum(dd - j, 1)
        r = rng.randint(0, centers0, j, nj)

        def fix(_, p):
            cnt = jnp.sum((sel <= p[:, None]).astype(jnp.int32), axis=1)
            return r + cnt

        return sel.at[:, j].set(jax.lax.fori_loop(0, j + 1, fix, r))

    sel = jax.lax.fori_loop(0, K, body, sel0)
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    take_all = dd[:, None] <= K
    pos = jnp.where(take_all, slots, sel)
    mask = slots < jnp.minimum(dd, K)[:, None]
    return jnp.where(mask, pos, 0)


eq = bool(jnp.all(pos_j1(deg0) == pos_a))
print(f"j+1 fixpoint bit-equal to K-iteration fixpoint: {eq}", flush=True)
print("done", flush=True)

"""Public test utilities.

Analog of the reference's shared test helpers (reference:
python test_utils/test_comm.py:21-203 — deterministic host feature/CSR
generators, host reference samplers, random partitions — and the host-RNG
parity ops, wholegraph_op.h:93-105).  Exposed so downstream users can write
the same style of parity tests against this framework.
"""

from __future__ import annotations

import numpy as np

from .ops import rng

HOP_STRIDE = 1 << 20


def deterministic_rows(n: int, dim: int, dtype=np.float32, scale: float = 1.0):
    """Value-from-index features: row i, col j = f(i, j)
    (embedding_test_utils.cu analog)."""
    i = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    return ((i * 131.0 + j * 7.0 + 1.0) % 997.0 * scale / 997.0).astype(dtype)


def random_csr(n: int, avg_deg: float, seed: int = 0, max_deg=None):
    """Random CSR with varied degrees incl. zeros (gen_csr analog,
    test_comm.py)."""
    rs = np.random.RandomState(seed)
    degs = rs.poisson(avg_deg, n).astype(np.int64)
    degs[rs.rand(n) < 0.05] = 0
    if max_deg:
        degs = np.minimum(degs, max_deg)
    row_ptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    col = rs.randint(0, n, row_ptr[-1]).astype(np.int32)
    return row_ptr, col


def random_partition(n: int, world: int, seed: int = 0):
    """Random non-equal shard sizes (test_comm.py:194 random_partition)."""
    rs = np.random.RandomState(seed)
    cuts = np.sort(rs.choice(max(n, world), world - 1, replace=False))
    sizes = np.diff(np.concatenate([[0], cuts, [n]]))
    return tuple(int(x) for x in np.maximum(sizes, 0))


def host_sample_uniform(row_ptr, col, centers, K, seed=0, hop=0):
    """Bit-exact host replay of the device unweighted sampler
    (graph_sampling_test_utils.cu analog)."""
    B = len(centers)
    pos = np.zeros((B, K), np.int32)
    mask = np.zeros((B, K), bool)
    nbrs = np.full((B, K), -1, np.int32)
    for i, c in enumerate(centers):
        start, end = row_ptr[c], row_ptr[c + 1]
        deg = end - start
        if deg <= K:
            for j in range(deg):
                pos[i, j] = j
                mask[i, j] = True
        else:
            chosen = []
            for j in range(K):
                r = int(
                    rng.randint_np(
                        seed, np.uint32(c), np.uint32(hop * HOP_STRIDE + j), deg - j
                    )
                )
                p = r
                while True:
                    cnt = sum(1 for s in chosen if s <= p)
                    pn = r + cnt
                    if pn == p:
                        break
                    p = pn
                chosen.append(p)
                pos[i, j] = p
                mask[i, j] = True
        for j in range(K):
            if mask[i, j]:
                nbrs[i, j] = col[start + pos[i, j]]
    return nbrs, mask, pos


def host_sample_weighted(row_ptr, col, weights, centers, K, seed=0, hop=0):
    """Bit-exact host replay of the device A-Res weighted sampler."""
    B = len(centers)
    pos = np.zeros((B, K), np.int32)
    mask = np.zeros((B, K), bool)
    nbrs = np.full((B, K), -1, np.int32)
    for i, c in enumerate(centers):
        start, end = row_ptr[c], row_ptr[c + 1]
        deg = end - start
        offs = np.arange(deg, dtype=np.uint32)
        u = rng.rand_uniform_np(
            seed, np.full(deg, c, np.uint32), np.uint32(hop * HOP_STRIDE) + offs
        )
        w = weights[start:end].astype(np.float32)
        key = np.where(
            w > 0, np.log(np.maximum(u, 1e-20)) / np.maximum(w, 1e-30), -np.inf
        )
        order = np.argsort(-key, kind="stable")[: min(K, deg)]
        order = order[key[order] > -np.inf]
        for j, p in enumerate(order):
            pos[i, j] = p
            mask[i, j] = True
            nbrs[i, j] = col[start + p]
    return nbrs, mask, pos

"""Host (numpy) reference samplers — the parity pillar.

Replays the device samplers bit-exactly using the numpy replica of the
counter RNG, mirroring the reference's host-side reference samplers
(reference: cpp/tests/wholegraph_ops/graph_sampling_test_utils.cu and
python test_utils/test_comm.py:100-158, which replay the device PCG
sequence on host)."""

import numpy as np

from wholegraph_tpu.ops import rng

HOP_STRIDE = 1 << 20


def sample_uniform_host(row_ptr, col, centers, K, seed=0, hop=0):
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
                r = int(rng.randint_np(seed, np.uint32(c), np.uint32(hop * HOP_STRIDE + j), deg - j))
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


def sample_weighted_host(row_ptr, col, weights, centers, K, seed=0, hop=0):
    B = len(centers)
    pos = np.zeros((B, K), np.int32)
    mask = np.zeros((B, K), bool)
    nbrs = np.full((B, K), -1, np.int32)
    for i, c in enumerate(centers):
        start, end = row_ptr[c], row_ptr[c + 1]
        deg = end - start
        offs = np.arange(deg, dtype=np.uint32)
        u = rng.rand_uniform_np(seed, np.full(deg, c, np.uint32), np.uint32(hop * HOP_STRIDE) + offs)
        w = weights[start:end].astype(np.float32)
        key = np.where(w > 0, np.log(np.maximum(u, 1e-20)) / np.maximum(w, 1e-30), -np.inf)
        k = min(K, deg)
        # top-k, ties -> earlier position (stable)
        order = np.argsort(-key, kind="stable")[:k]
        valid = key[order] > -np.inf
        order = order[valid]
        for j, p in enumerate(order):
            pos[i, j] = p
            mask[i, j] = True
            nbrs[i, j] = col[start + p]
    return nbrs, mask, pos


def random_csr(n, avg_deg, seed=0, max_deg=None):
    """Random CSR graph with varied degrees incl. zeros."""
    rs = np.random.RandomState(seed)
    degs = rs.poisson(avg_deg, n).astype(np.int64)
    degs[rs.rand(n) < 0.05] = 0
    if max_deg:
        degs = np.minimum(degs, max_deg)
    row_ptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    col = rs.randint(0, n, row_ptr[-1]).astype(np.int32)
    return row_ptr, col

"""Diagnose the r5b test_weighted_fused_pair_blocks_bitequal_tpu failure:
which regime (2blk single-shot vs ladder), which field, which centers —
and bisect the two r5b levers (_SELECT_PALLAS / _SLAB_FETCH) on silicon.

Run: nohup python scripts/exp_wfused_diag.py > artifacts/exp_wfused_diag.log 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops import sampling as S
from wholegraph_tpu.ops.sampling import csr_sample_neighbors, interleave_col_weights

rs = np.random.RandomState(7)
for tag, lo, hi, nheavy in [("2blk", 16, 49, 0), ("ladder", 16, 49, 12)]:
    n, K, B = 50_000, 10, 8192
    deg_np = rs.randint(lo, hi, n).astype(np.int32)
    if nheavy:
        deg_np[rs.choice(n, nheavy, replace=False)] = rs.randint(600, 1500, nheavy)
    rp_np = np.concatenate([[0], np.cumsum(deg_np)]).astype(np.int32)
    E = int(rp_np[-1])
    col = jnp.asarray(rs.randint(0, n, E).astype(np.int32))
    weights = jnp.asarray(rs.rand(E).astype(np.float32) + 0.05)
    centers_np = rs.randint(0, n, B).astype(np.int32)
    centers = jnp.asarray(centers_np)
    rp = jnp.asarray(rp_np)
    cw = jax.jit(interleave_col_weights)(col, weights)

    for sel, slab in ((False, False), (True, False), (False, True), (True, True)):
        S._SELECT_PALLAS, S._SLAB_FETCH = sel, slab
        ref = csr_sample_neighbors(rp, col, centers, K, seed=3, hop=1,
                                   weights=weights, max_degree=4096)
        got = csr_sample_neighbors(rp, col, centers, K, seed=3, hop=1,
                                   weights=weights, max_degree=4096,
                                   cw_blocks=cw)
        msg = []
        for field in ("neighbors", "mask", "positions", "edge_ids"):
            a = np.asarray(getattr(got, field))
            b = np.asarray(getattr(ref, field))
            neq = np.nonzero((a != b).any(axis=1))[0] if a.ndim == 2 else np.nonzero(a != b)[0]
            if neq.size:
                c0 = int(neq[0])
                msg.append(
                    f"{field}: {neq.size} rows differ; first b={c0} "
                    f"center={centers_np[c0]} deg={deg_np[centers_np[c0]]} "
                    f"start={rp_np[centers_np[c0]]} "
                    f"got={a[c0].tolist()} ref={b[c0].tolist()}"
                )
        status = "; ".join(msg) if msg else "bitequal"
        print(f"{tag} sel={int(sel)} slab={int(slab)}: {status}", flush=True)
print("done", flush=True)

"""Round-4 weighted-sampling component profile (VERDICT r3 item 3).

Times the weighted sampler's building blocks at the HONEST bench config
(unaligned mixed-degree CSR, B=64K, mean deg 32, K=15, 2M nodes) to find
where the 2.6x gap to uniform hides, plus candidate replacements:

  - full weighted / full uniform (honest CSR), G=4 vs G=1 bucketing
  - ptr-pair fetch, block DMA, key hash+log, approx_max_k, K-pass argmax,
    batch argsort + scatter

  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_wsample2.py > /tmp/exp_wsample2.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import wholegraph_tpu.ops.sampling as S
from wholegraph_tpu.ops import rng
from wholegraph_tpu.utils.perf import measure_chain

N, DEG, B, K = 2_000_000, 32, 1 << 16, 15


def med(step, *args, iters=8):
    return sorted(measure_chain(step, iters, *args) for _ in range(3))[1]


def run(tag, step, *args, edges=B * K):
    try:
        dt = med(step, *args)
        print(f"{tag}: {edges / dt / 1e6:.1f} Medges/s ({dt*1e3:.2f} ms)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    degs = np.random.RandomState(1).randint(DEG // 2, DEG + DEG // 2 + 1, N)
    rp = np.concatenate([[0], np.cumsum(degs)]).astype(np.int32)
    E = int(rp[-1])
    row_ptr = jnp.asarray(rp)
    col = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(0), (E,), 0, N, dtype=jnp.int32))()
    weights = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(1), (E,)) + 0.1)()

    def centers_of(i):
        return jax.random.randint(jax.random.PRNGKey(i), (B,), 0, N,
                                  dtype=jnp.int32)

    def full(i, col, *w):
        res = S.csr_sample_neighbors(
            row_ptr, col, centers_of(i), K, seed=0,
            weights=w[0] if w else None, max_degree=65536)
        return res.neighbors[0, 0].astype(jnp.float32)

    run("full uniform (honest)", full, col)
    run("full weighted G=4 (honest)", full, col, weights)

    # G=1 (no bucketing)
    import wholegraph_tpu.ops.sampling as SS
    orig = SS._sample_positions_weighted

    def g1_weighted(start, deg, Kk, seed, centers, hop, w, md, chunk=512):
        return SS._weighted_block_ladder(start, deg, Kk, seed, centers, hop, w, md)

    SS._sample_positions_weighted = (
        lambda start, deg, Kk, seed, centers, hop, w, md, chunk=512:
        g1_weighted(start, deg, Kk, seed, centers, hop, w, md)
        if not hasattr(w, "gather") else orig(start, deg, Kk, seed, centers, hop, w, md)
    )
    run("full weighted G=1 (honest)", full, col, weights)
    SS._sample_positions_weighted = orig

    # ---- components ----
    start = jnp.take(row_ptr, centers_of(0), mode="clip").astype(jnp.int32)
    deg = (jnp.take(row_ptr, centers_of(0) + 1, mode="clip") - start).astype(jnp.int32)

    def ptr_fetch(i, row_ptr):
        c = centers_of(i)
        lo = jnp.take(row_ptr, c, mode="clip")
        hi = jnp.take(row_ptr, c + 1, mode="clip")
        return (lo[0] + hi[0]).astype(jnp.float32)

    run("ptr pair fetch (2x jnp.take)", ptr_fetch, row_ptr)

    from wholegraph_tpu.ops.gather_pallas import _gather_rows_pallas3_impl
    pad_e = -E % 128
    w2 = jnp.concatenate([weights, jnp.zeros((pad_e,))]).reshape(-1, 128)

    def blk_fetch(i, w2, nblk):
        c = centers_of(i)
        s = jnp.take(row_ptr, c, mode="clip").astype(jnp.int32)
        bids = (s >> 7)[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
        fl = jnp.clip(bids, 0, w2.shape[0] - 1).reshape(-1)
        out = _gather_rows_pallas3_impl(w2, fl)
        return out[0, 0, 0]

    run("weight block DMA nblk=1", lambda i, w2: blk_fetch(i, w2, 1), w2)
    run("weight block DMA nblk=2", lambda i, w2: blk_fetch(i, w2, 2), w2)

    def keys_only(i, span):
        c = centers_of(i)
        s = jnp.take(row_ptr, c, mode="clip").astype(jnp.int32)
        s_lane = s & 127
        offs = jnp.arange(span, dtype=jnp.int32)[None, :] - s_lane[:, None]
        valid = (offs >= 0) & (offs < DEG)
        offs_c = jnp.where(valid, offs, 0)
        u = rng.rand_uniform(0, jnp.broadcast_to(c[:, None], (B, span)), offs_c)
        w = jnp.abs(u) + 0.1
        key = jnp.where(valid, jnp.log(jnp.maximum(u, 1e-20)) / w, -jnp.inf)
        return key[0, 0]

    run("key hash+log span128", lambda i: keys_only(i, 128))
    run("key hash+log span256", lambda i: keys_only(i, 256))

    def topk_only(i, span):
        key = jax.random.normal(jax.random.PRNGKey(i), (B, span))
        v, idx = lax.approx_max_k(key, K, recall_target=1.0,
                                  aggregate_to_topk=True)
        return v[0, 0] + idx[0, 0].astype(jnp.float32)

    run("approx_max_k [B,128]->15", lambda i: topk_only(i, 128))
    run("approx_max_k [B,256]->15", lambda i: topk_only(i, 256))

    def kpass_only(i, span):
        key = jax.random.normal(jax.random.PRNGKey(i), (B, span))
        iota = lax.broadcasted_iota(jnp.int32, (B, span), 1)
        acc_v = jnp.zeros((B, K), key.dtype)
        acc_i = jnp.zeros((B, K), jnp.int32)
        def body(j, carry):
            key, acc_v, acc_i = carry
            m = jnp.max(key, axis=1)
            am = jnp.argmax(key, axis=1).astype(jnp.int32)
            key = jnp.where(iota == am[:, None], -jnp.inf, key)
            return key, acc_v.at[:, j].set(m), acc_i.at[:, j].set(am)
        _, acc_v, acc_i = lax.fori_loop(0, K, body, (key, acc_v, acc_i))
        return acc_v[0, 0] + acc_i[0, 0].astype(jnp.float32)

    run("K-pass argmax [B,128]->15", lambda i: kpass_only(i, 128))
    run("K-pass argmax [B,256]->15", lambda i: kpass_only(i, 256))

    def sort_scatter(i):
        need = jax.random.randint(jax.random.PRNGKey(i), (B,), 0, 256,
                                  dtype=jnp.int32)
        order = jnp.argsort(need)
        pos = jnp.zeros((B, K), jnp.int32).at[order].set(
            jnp.broadcast_to(order[:, None], (B, K)))
        msk = jnp.zeros((B, K), bool).at[order].set(
            jnp.broadcast_to((order & 1)[:, None] == 0, (B, K)))
        return pos[0, 0].astype(jnp.float32) + msk[0, 0]

    run("argsort[B] + 2x scatter [B,K]", sort_scatter)

    def col_fetch_only(i, col):
        c = centers_of(i)
        res = S.csr_sample_neighbors(row_ptr, col, c, K, seed=0,
                                     max_degree=65536)
        return res.neighbors[0, 0].astype(jnp.float32)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

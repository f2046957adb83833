"""top-K=15 over [64K, 542] on v5e: lax.top_k lowers to a full sort
(~17 ms). Candidates: jax.lax.approx_max_k (TPU PartialReduce — check
EXACTNESS vs top_k at recall_target=1.0 and speed), and where the rest of
full_weighted's 49 ms hides (rand_uniform? take_along_axis? row_ptr fetch?).

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_topk.py > /tmp/exp_topk.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wholegraph_tpu.utils.perf import measure_chain

B, W, K = 1 << 16, 542, 15


def med(step, *args):
    return sorted(measure_chain(step, 8, *args) for _ in range(3))[1]


def main():
    print("backend:", jax.default_backend(), flush=True)

    # exactness: random keys + rows with many -inf + exact duplicates
    k = np.random.RandomState(0).randn(4096, W).astype(np.float32)
    k[:100, 5:] = -np.inf          # fewer than K valid
    k[200, 10] = k[200, 20]        # exact tie
    kj = jnp.asarray(k)
    tv, ti = lax.top_k(kj, K)
    for rt in (1.0, 0.99):
        av, ai = lax.approx_max_k(kj, K, recall_target=rt)
        vals_eq = np.array_equal(np.asarray(tv), np.asarray(av))
        # indices may differ on ties; compare the VALUE multisets per row
        print(f"approx rt={rt}: values_equal={vals_eq} "
              f"idx_equal={np.array_equal(np.asarray(ti), np.asarray(ai))}",
              flush=True)

    def keys(i):
        return jax.random.normal(jax.random.PRNGKey(i), (B, W))

    def t_lax(i):
        v, idx = lax.top_k(keys(i), K)
        return v[0, 0] + idx[0, 0]

    def t_approx(i):
        v, idx = lax.approx_max_k(keys(i), K, recall_target=1.0)
        return v[0, 0] + idx[0, 0]

    def t_approx_agg(i):
        v, idx = lax.approx_max_k(
            keys(i), K, recall_target=1.0, aggregate_to_topk=True
        )
        return v[0, 0] + idx[0, 0]

    def t_take_along(i):
        kk = keys(i)
        idx = jax.random.randint(jax.random.PRNGKey(i + 1), (B, K), 0, W)
        return jnp.take_along_axis(kk, idx, axis=1).sum()

    for tag, fn in (("lax.top_k", t_lax), ("approx_max_k", t_approx),
                    ("approx_agg", t_approx_agg), ("take_along", t_take_along)):
        try:
            dt = med(fn)
            print(f"{tag}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL ...{str(e)[-200:]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

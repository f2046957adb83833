"""Break down the sparse-apply cost at the bench shape (n_rows=1M, D=256,
batch=128K, LazyAdam): argsort | dedup | optimizer row math | full apply.
Also: how slow is a 1-D int32 argsort on v5e at 131K / 524K (it appears in
append_unique and every apply)?

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_apply.py > /tmp/exp_apply.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.utils.perf import measure_chain

N, D, B = 1_000_000, 256, 1 << 17


def med(step, *args):
    return sorted(measure_chain(step, 8, *args) for _ in range(3))[1]


def main():
    print("backend:", jax.default_backend(), flush=True)

    def ids_of(i, n=B):
        return jax.random.randint(jax.random.PRNGKey(i), (n,), 0, N, jnp.int32)

    # 1-D argsort scaling
    for n in (1 << 17, 1 << 19):
        dt = med(lambda i, n=n: jnp.argsort(ids_of(i, n)).astype(jnp.float32)[0])
        print(f"argsort[{n}]: {dt*1e3:.2f} ms", flush=True)
    dt = med(lambda i: jnp.sort(ids_of(i)).astype(jnp.float32)[0])
    print(f"sort[{B}]: {dt*1e3:.2f} ms", flush=True)

    grads = jax.jit(lambda: jnp.ones((B, D), jnp.float32))()

    from wholegraph_tpu.embedding.embedding import _dedup_sorted

    def dd(i, grads):
        u, g = _dedup_sorted(ids_of(i), grads, jnp.int32(N))
        return g[0, 0] + u[0].astype(jnp.float32)

    print(f"dedup_sorted: {med(dd, grads)*1e3:.2f} ms", flush=True)

    # optimizer row math only (take + LazyAdam + set on table & 2 slots)
    tab = jax.jit(lambda: jnp.zeros((N, D), jnp.float32))()

    def opt_rows(i, tab, grads):
        idx = ids_of(i)
        p = jnp.take(tab, idx, axis=0)
        m = jnp.take(tab, idx, axis=0)
        v = jnp.take(tab, idx, axis=0)
        m2 = 0.9 * m + 0.1 * grads
        v2 = 0.99 * v + 0.01 * grads * grads
        p2 = p - 0.01 * m2 / (jnp.sqrt(v2) + 1e-8)
        out = tab.at[idx].set(p2)
        out = out.at[idx].set(m2)
        out = out.at[idx].set(v2)
        return out[0, 0]

    print(f"opt_rows (3 take + 3 set): {med(opt_rows, tab, grads)*1e3:.2f} ms",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

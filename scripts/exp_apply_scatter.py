"""Why is the apply step's masked scatter 2x slower than its gather?

r4 apply trace (/tmp/trace_apply_r4): per iteration at B=128K/D=256 the 3
scatter_rows_masked3 calls cost 2.84 ms each (46 GB/s) while the 3
_gather_rows_pallas3_impl calls cost 1.34 ms (98 GB/s) with the SAME ring
params (id_block 1024, per_step 256, n_inflight 128), and the standalone
scatter bench reads 141 GB/s (scatter_rows_pallas3, per_step 1024,
n_inflight 256).  A/B the factors: masked vs unmasked, per_step, ring
depth, and in-program composition (3 back-to-back rings like apply).

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_apply_scatter.py > /tmp/exp_apply_scatter.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.gather_pallas import (
    _gather_rows_pallas3_impl,
    scatter_rows_masked3,
    scatter_rows_pallas3,
)

N, D, B = 1_000_000, 256, 1 << 17
P = D // 128
iters = 6


def chain_scatter(fn, n_tables=1, tag=""):
    """Time `tab = fn(i, tab, rows)` as a donated carried chain."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(tabs, rows, n):
        return jax.lax.fori_loop(0, n, lambda i, ts: fn(i, ts, rows), tabs)

    tabs = tuple(
        jax.jit(lambda: jnp.zeros((N, P, 128), jnp.float32))()
        for _ in range(n_tables)
    )
    rows = jax.jit(lambda: jnp.ones((B, P, 128), jnp.float32))()

    def timed(n, tabs):
        t0 = time.perf_counter()
        tabs = run_n(tabs, rows, n)
        float(tabs[0][0, 0, 0])
        return time.perf_counter() - t0, tabs

    tabs = run_n(tabs, rows, 1)
    samples = []
    for _ in range(3):
        base, tabs = timed(1, tabs)
        full, tabs = timed(1 + iters, tabs)
        samples.append(max((full - base) / iters, 1e-9))
    dt = sorted(samples)[1]
    moved = B * D * 4 * n_tables
    print(f"{tag}: {moved / dt / 1e9:.1f} GB/s ({dt*1e3:.2f} ms)", flush=True)


def ids_of(i, masked):
    ids = jax.random.randint(jax.random.PRNGKey(i), (B,), 0, N, dtype=jnp.int32)
    if masked:
        drop = jax.random.bernoulli(jax.random.PRNGKey(i + 999), 0.05, (B,))
        ids = jnp.where(drop, -1, ids)
    return ids


def main():
    print("device:", jax.devices()[0], flush=True)

    mk = lambda **kw: kw

    for tag, masked, kw in [
        ("S1 unmasked ps1024 if256 (bench cfg)", False,
         mk()),
        ("S2 masked   ps256  if128 (apply cfg)", True,
         mk(per_step=256, n_inflight=128)),
        ("S3 masked   ps256  if256", True, mk(per_step=256, n_inflight=256)),
        ("S4 masked   ps1024 if128", True, mk(per_step=1024, n_inflight=128)),
        ("S5 masked   ps1024 if256", True, mk(per_step=1024, n_inflight=256)),
        ("S6 unmasked ps256  if128", False, mk(per_step=256, n_inflight=128)),
        ("S7 masked novalid ids ps256 if128", True,
         mk(per_step=256, n_inflight=128)),
    ]:
        sfn = scatter_rows_masked3 if masked else scatter_rows_pallas3
        real_mask = masked and "novalid" not in tag

        def one(i, tabs, rows, _s=sfn, _m=real_mask, _kw=kw):
            ids = ids_of(i, _m)
            return (_s(tabs[0], ids, rows, **_kw),)

        try:
            chain_scatter(one, 1, tag)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)

    # A1: three back-to-back masked scatters (the apply composition)
    def three(i, tabs, rows):
        ids = ids_of(i, True)
        kw = dict(per_step=256, n_inflight=128)
        return tuple(scatter_rows_masked3(t, ids, rows, **kw) for t in tabs)

    chain_scatter(three, 3, "A1 3x masked ps256 if128 back-to-back")

    # A2: gather baseline at the apply config
    @functools.partial(jax.jit, donate_argnums=())
    def g_one(i, tab):
        ids = jnp.clip(ids_of(i, False), 0, N - 1)
        out = _gather_rows_pallas3_impl(
            tab, ids, id_block=1024, per_step=256, n_inflight=128
        )
        return out[0, 0, 0]

    tab = jax.jit(lambda: jnp.zeros((N, P, 128), jnp.float32))()
    from wholegraph_tpu.utils.perf import measure_chain

    dts = sorted(measure_chain(g_one, iters, tab) for _ in range(3))
    dt = dts[1]
    print(f"A2 gather ps256 if128: {B * D * 4 / dt / 1e9:.1f} GB/s "
          f"({dt*1e3:.2f} ms)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

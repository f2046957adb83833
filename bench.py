"""Benchmark harness — prints ONE JSON line.

Headline metric mirrors the reference's gather/scatter bandwidth bench
(reference: cpp/bench/wholememory_ops/gather_scatter_bench.cu:346-365 —
bandwidth = gathered_bytes / iter_time; default config 400GB table / 20GB
gather / dim 256 float scaled down to one chip's HBM).

vs_baseline is the fraction of single-chip speed-of-light: a gather must
read + write each row once, so SoL = HBM_BW / 2 "gathered bytes"/s
(v5e: 819 GB/s HBM -> 409.5 GB/s SoL).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


HBM_GBPS = {
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "cpu": 100.0,  # meaningless; keeps the harness runnable off-TPU
}


def detect_hbm_gbps() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    if "lite" in kind or "v5" in kind:
        return HBM_GBPS["v5e"]
    return HBM_GBPS["cpu"]


def bench_gather(n_rows=4_000_000, dim=256, batch=1 << 19, iters=8):
    """Timing note: through remote-execution tunnels block_until_ready() can
    return before device completion, so we time a dependent chain with a
    dynamic trip count between two scalar host fetches and difference out the
    fixed round-trip cost."""
    import wholegraph_tpu as wg

    mesh = wg.parallel.create_global_mesh()
    table = wg.ShardedTable.create(mesh, n_rows, dim)  # zeros, on-device

    @jax.jit
    def chain(data, n):
        def body(i, acc):
            ids = jax.random.randint(jax.random.PRNGKey(i), (batch,), 0, n_rows)
            rows = wg.ops.gather(
                data, ids, plan=table.plan, mesh=mesh, axis=table.axis
            )
            return acc + rows[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(chain(table.data, 1))  # compile + warm
    t0 = time.perf_counter()
    float(chain(table.data, 1))
    t_base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(table.data, 1 + iters))
    t_full = time.perf_counter() - t0
    dt = max((t_full - t_base) / iters, 1e-9)
    gathered_bytes = batch * dim * 4
    return gathered_bytes / dt / 1e9, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    backend = jax.default_backend()
    if backend == "cpu":
        # keep CPU smoke runs fast
        args.rows, args.batch, args.iters = 200_000, 1 << 16, 3

    gbps, dt = bench_gather(args.rows, args.dim, args.batch, args.iters)
    sol = detect_hbm_gbps() / 2.0
    print(
        json.dumps(
            {
                "metric": "embedding_gather_bandwidth",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / sol, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

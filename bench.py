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

    world = mesh.shape[table.axis]
    use_pallas3 = (
        world == 1 and jax.default_backend() == "tpu" and dim % 128 == 0
    )

    @jax.jit
    def chain(data, n):
        def body(i, acc):
            ids = jax.random.randint(jax.random.PRNGKey(i), (batch,), 0, n_rows)
            if use_pallas3:
                # native tile layout: measures the gather itself without the
                # artificial [B, d0, 128] -> [B, D] relayout pass
                from wholegraph_tpu.ops.gather_pallas import gather_rows_pallas3

                phys = table.plan.physical_index(ids)
                rows = gather_rows_pallas3(data, phys.astype(jnp.int32))
                return acc + rows[0, 0, 0]
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


def bench_sampling(n_rows=2_000_000, deg=32, batch=1 << 16, K=15, iters=8):
    """Neighbor-sampling throughput (edges/s) — the reference's sampler
    bench dimension (cpp/tests/wholegraph_ops parameterized perf)."""
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    row_ptr = jnp.arange(n_rows + 1, dtype=jnp.int32) * deg

    @jax.jit
    def make_col():
        return jax.random.randint(
            jax.random.PRNGKey(0), (n_rows * deg,), 0, n_rows, dtype=jnp.int32
        )

    col = make_col()

    @jax.jit
    def chain(col, n):
        def body(i, acc):
            centers = jax.random.randint(
                jax.random.PRNGKey(i), (batch,), 0, n_rows, dtype=jnp.int32
            )
            res = csr_sample_neighbors(row_ptr, col, centers, K, seed=0)
            return acc + res.neighbors[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(chain(col, 1))
    t0 = time.perf_counter()
    float(chain(col, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(col, 1 + iters))
    full = time.perf_counter() - t0
    dt = max((full - base) / iters, 1e-9)
    return batch * K / dt, dt


def bench_spmm(num_src=1 << 17, batch=1 << 16, K=16, dim=256, iters=8):
    """Padded-neighborhood aggregation throughput (the SpMM of the sampled
    path; replaces cuGraph-Ops agg_concat_n2n)."""
    from wholegraph_tpu.ops.spmm import padded_reduce

    @jax.jit
    def chain(x, n):
        def body(i, acc):
            nbr = jax.random.randint(
                jax.random.PRNGKey(i), (batch, K), 0, num_src, dtype=jnp.int32
            )
            out = padded_reduce(x, nbr, jnp.ones((batch, K), bool), "mean")
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    x = jax.jit(lambda: jnp.ones((num_src, dim), jnp.float32))()
    float(chain(x, 1))
    t0 = time.perf_counter()
    float(chain(x, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(x, 1 + iters))
    full = time.perf_counter() - t0
    dt = max((full - base) / iters, 1e-9)
    return batch * K / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="gather", choices=["gather", "sampling", "spmm"])
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    backend = jax.default_backend()
    if backend == "cpu":
        # keep CPU smoke runs fast
        args.rows, args.batch, args.iters = 200_000, 1 << 14, 3

    if args.metric == "sampling":
        eps, dt = bench_sampling(
            n_rows=min(args.rows, 2_000_000), batch=min(args.batch, 1 << 16),
            iters=args.iters,
        )
        # SoL proxy: row_ptr+col fetch bound -> edges/s at HBM bw over
        # (4B col + amortized ptr) per edge is optimistic; report raw
        print(
            json.dumps(
                {
                    "metric": "sampling_throughput",
                    "value": round(eps / 1e6, 3),
                    "unit": "Medges/s",
                    "vs_baseline": round(eps * 4 / detect_hbm_gbps() / 1e9, 4),
                }
            )
        )
        return
    if args.metric == "spmm":
        eps, dt = bench_spmm(batch=min(args.batch, 1 << 16), dim=args.dim,
                             iters=args.iters)
        bytes_per_edge = args.dim * 4
        sol_eps = detect_hbm_gbps() * 1e9 / bytes_per_edge
        print(
            json.dumps(
                {
                    "metric": "spmm_throughput",
                    "value": round(eps / 1e6, 3),
                    "unit": "Medges/s",
                    "vs_baseline": round(eps / sol_eps, 4),
                }
            )
        )
        return

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

"""Benchmark harness — prints ONE JSON line.

Headline metric mirrors the reference's gather bandwidth bench
(reference: cpp/bench/wholememory_ops/gather_scatter_bench.cu:346-365 —
bandwidth = gathered_bytes / iter_time; default config 400GB table / 20GB
gather / dim 256 float scaled down to one chip's HBM), measured on the
production embedding-gather batch shape: deduped + sorted ids, which is
what every training-step gather receives from append_unique and what the
reference's own sort/unique fast path optimizes for
(gather_op.cpp:118-120, sort_unique_indices_func.cu).  The uniform-random
unsorted variant stays available as --metric gather_random; it is bound by
the ~8 ns/descriptor DMA issue rate (measured hardware ceiling, exhaustive
matrix in docs/DESIGN.md), not by HBM bandwidth.  Additional modes
mirror the rest of the reference harness: scatter (gather_scatter_bench.cu
mode switch :212,381), sampling / weighted sampling (wholegraph_ops perf
tests), apply (gather_gradient_apply path), spmm (cuGraph-Ops agg), host
(device_cached_host tier), and scaling (multi-device efficiency, the
BASELINE >=80% target).

vs_baseline is the fraction of single-chip speed-of-light: a gather must
read + write each row once, so SoL = HBM_BW / 2 "gathered bytes"/s
(v5e: 819 GB/s HBM -> 409.5 GB/s SoL).

Timing notes: through remote-execution tunnels block_until_ready() can
return before device completion, so everything here times a dependent chain
with a dynamic trip count between two scalar host fetches and differences
out the fixed round trip (utils/perf.py measure_chain).
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp

from wholegraph_tpu.utils.perf import measure_chain


def measure_median(step, iters, *args, runs=3):
    """Median of ``runs`` measure_chain samples: a single RTT spike through
    the remote tunnel can bias one differenced sample either way (observed
    both 0.00 ms and >HBM-peak artifacts)."""
    return sorted(measure_chain(step, iters, *args) for _ in range(runs))[runs // 2]


def measure_eager(step, iters, *args, runs=3):
    """Eager-repeat timing with the tunnel RTT differenced out: dispatch k
    then 2k calls (PJRT executes them in order on the device stream), fetch
    ONE scalar at the end of each batch, and difference — the fixed
    dispatch+fetch round trip (~200-350 ms through axon, polluting ~30% of
    a 1 s step) cancels like measure_chain's calibration.  Unlike
    measure_chain it does not fuse the steps into one fori program (the
    GAT chain program kills the TPU worker, scripts/exp_gat_chain.py)."""
    import time

    f = jax.jit(step)
    float(f(jnp.int32(0), *args))  # compile + warm

    def run(k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = f(jnp.int32(i), *args)
        float(out)
        return time.perf_counter() - t0

    samples = []
    for r in range(runs):
        t1 = run(iters)
        t2 = run(2 * iters)
        samples.append((t2 - t1) / iters)
    return sorted(samples)[len(samples) // 2]


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
    import wholegraph_tpu as wg

    # cap the table at ~6 GiB so wide-dim sweeps (--dim 768/1024) fit HBM
    # next to the batch/chain buffers (the chain keeps ~2 output copies
    # alive: batch*dim*4 each); bandwidth is table-size-independent well
    # past cache scale.  Plane counts that are neither <=2 nor a multiple
    # of 8 (e.g. dim 768 f32 = 6 planes) are NOT XLA-layout-native: the
    # [N, P, 128] argument pads P->8 and the pallas custom call's dense
    # layout forces a one-time whole-table relayout copy — cap those at
    # 3.5 GiB so table + padded copy coexist (DESIGN.md layout guidance).
    planes = dim // 128 if dim % 128 == 0 else 0
    native = planes in (1, 2) or (planes and planes % 8 == 0)
    cap = (6 << 30) if native else (35 << 27)
    n_rows = min(n_rows, cap // (dim * 4))
    mesh = wg.parallel.create_global_mesh()
    world = mesh.shape["data"]
    use_pallas3 = (
        world == 1 and jax.default_backend() == "tpu" and dim % 128 == 0
    )
    if use_pallas3:
        # NATIVE tile layout table (the production trainable-table layout,
        # Embedding.native_layout): feeding the ring a 2-D [N, D] table
        # makes XLA re-run the [N, D] -> [N, D//128, 128] relayout copy
        # inside the measurement loop (a full-table HBM pass per iter; at
        # dim 768 the padded copy alone is 8 GB and OOMs the chip)
        from wholegraph_tpu.ops.gather_pallas import gather_rows_pallas3

        data0 = jax.jit(
            lambda: jnp.zeros((n_rows, dim // 128, 128), jnp.float32)
        )()

        def step(i, data):
            ids = jax.random.randint(
                jax.random.PRNGKey(i), (batch,), 0, n_rows
            )
            rows = gather_rows_pallas3(data, ids.astype(jnp.int32))
            return rows[0, 0, 0]

        dt = measure_median(step, iters, data0)
        return batch * dim * 4 / dt / 1e9, dt

    table = wg.ShardedTable.create(mesh, n_rows, dim)  # zeros, on-device

    def step(i, data):
        ids = jax.random.randint(jax.random.PRNGKey(i), (batch,), 0, n_rows)
        rows = wg.ops.gather(data, ids, plan=table.plan, mesh=mesh, axis=table.axis)
        return rows[0, 0]

    dt = measure_median(step, iters, table.data)
    return batch * dim * 4 / dt / 1e9, dt


def bench_gather_sorted(n_rows=4_000_000, dim=256, batch=1 << 19, iters=8,
                        dtype=jnp.float32):
    """Sorted-id gather bandwidth (the reference's sorted/unique-indices fast
    path, gather_op.cpp:118-120): deduped sorted ids at ~batch/n_rows density
    through local_take_sorted (windowed multi-row DMA + MXU one-hot select,
    with exact repair of out-of-window ids).  ``dtype=bf16`` measures the
    half-byte table path (reference half/bf16 dtype coverage,
    tensor_description.h:29-40); returns DELIVERED bytes/s — the caller
    scales to f32-equivalent serving capacity."""
    import numpy as np

    from wholegraph_tpu.ops import local_take_sorted

    isz = jnp.dtype(dtype).itemsize
    n_rows = min(n_rows, (6 << 30) // (dim * isz))  # fit HBM at wide dims
    rng = np.random.RandomState(0)
    span = min(n_rows, int(batch * 1.25))
    # mirror production layout per the dispatch heuristic: when sorted ids
    # route to the RING (wide rows / low density), tables live in the
    # native [N, D//128, 128] layout (Embedding.native_layout) — a 2-D
    # table would re-run the relayout copy inside the chain
    from wholegraph_tpu.ops.gather_pallas import choose_gather_kernel

    use_native = (
        jax.default_backend() == "tpu"
        and dim % 128 == 0
        and choose_gather_kernel(batch / span, dtype, dim) == "ring"
    )
    shape = (n_rows, dim // 128, 128) if use_native else (n_rows, dim)
    table = jax.jit(lambda: jnp.ones(shape, dtype))()
    base = rng.randint(0, n_rows - span, size=iters + 2)

    ids_list = [
        jnp.asarray(
            np.sort(b + rng.choice(span, batch, replace=False)).astype(np.int32)
        )
        for b in base
    ]

    on_tpu = jax.default_backend() == "tpu"

    def step(i, tab):
        ids = jax.lax.switch(i % len(ids_list), [lambda x=x: x for x in ids_list])
        out = local_take_sorted(tab, ids, density=batch / span)
        if on_tpu:
            # the pallas kernels are side-effectful — the full gather always
            # executes; a scalar probe adds zero overhead to the headline
            return out[0, 0]
        # CPU smoke: jnp.take has no side effects, so XLA slices the whole
        # batch away through out[0,0] (measured: the chain collapses to the
        # 1e-9 floor => absurd GB/s); consume a batch-spanning column
        return out[:, 0].sum()

    dt = measure_median(step, iters, table)
    return batch * dim * isz / dt / 1e9, dt


def bench_scatter(n_rows=4_000_000, dim=256, batch=1 << 19, iters=8):
    """Scatter bandwidth (the reference bench's scatter mode,
    gather_scatter_bench.cu:381): random-row writes into the table.

    The table is the fori_loop CARRY with the buffer donated at the jit
    boundary, so the in-place pallas scatter updates one 4 GB buffer across
    the whole chain — an un-carried table forces XLA to materialize two
    table copies per iteration and OOMs a 16 GB chip."""
    import functools
    import time

    import wholegraph_tpu as wg

    mesh = wg.parallel.create_global_mesh()
    world = mesh.shape["data"]
    use_pallas = world == 1 and jax.default_backend() == "tpu" and dim % 128 == 0
    n_rows = min(n_rows, (6 << 30) // (dim * 4))  # fit HBM at wide dims
    table = wg.ShardedTable.create(mesh, n_rows, dim)
    rows_mat = jax.jit(lambda: jnp.ones((batch, dim), jnp.float32))()
    plan = table.plan

    if use_pallas:
        # native [N, D//128, 128] layout as the loop carry: the [N, D]
        # reshape is a true relayout XLA would re-run every iteration
        from wholegraph_tpu.ops.gather_pallas import scatter_rows_pallas3

        rows_mat = rows_mat.reshape(batch, dim // 128, 128)
        tab0 = table.data.reshape(n_rows, dim // 128, 128)

        def one(i, tab, rows):
            ids = jax.random.randint(
                jax.random.PRNGKey(i), (batch,), 0, n_rows, dtype=jnp.int32
            )
            return scatter_rows_pallas3(tab, ids, rows)
    else:
        tab0 = table.data

        def one(i, tab, rows):
            ids = jax.random.randint(jax.random.PRNGKey(i), (batch,), 0, n_rows)
            return wg.ops.scatter(tab, ids, rows, plan=plan, mesh=mesh)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_n(tab, rows, n):
        return jax.lax.fori_loop(0, n, lambda i, t: one(i, t, rows), tab)

    def timed(n, tab):
        t0 = time.perf_counter()
        tab = scatter_n(tab, rows_mat, n)
        float(tab[(0,) * tab.ndim])  # force completion through the tunnel
        return time.perf_counter() - t0, tab

    tab = scatter_n(tab0, rows_mat, 1)  # compile + warm
    samples = []
    for _ in range(3):
        base, tab = timed(1, tab)
        full, tab = timed(1 + iters, tab)
        samples.append(max((full - base) / iters, 1e-9))
    dt = sorted(samples)[1]
    return batch * dim * 4 / dt / 1e9, dt


def bench_apply(n_rows=1_000_000, dim=256, batch=1 << 17, iters=8):
    """Sparse optimizer apply throughput (gather_gradient_apply analog):
    updated rows/s through bucket-exchange + dedup + LazyAdam."""
    import numpy as np

    import wholegraph_tpu as wg
    from wholegraph_tpu.embedding import Embedding, LazyAdam

    mesh = wg.parallel.create_global_mesh()
    emb = Embedding.create(mesh, n_rows, dim, optimizer=LazyAdam())
    state = emb.init(jax.random.PRNGKey(0))
    from jax.sharding import NamedSharding, PartitionSpec as P

    rs = np.random.RandomState(0)
    ids = jax.device_put(
        jnp.asarray(rs.randint(0, n_rows, batch)), NamedSharding(mesh, P("data"))
    )
    grads = jax.device_put(
        jnp.ones((batch, dim), jnp.float32), NamedSharding(mesh, P("data", None))
    )

    # chain full apply steps: state is the carried dependency
    import time

    @jax.jit
    def apply_n(state, n):
        def body(i, st):
            return emb.apply_gradients(st, ids, grads, 0.01)

        return jax.lax.fori_loop(0, n, body, state)

    state = apply_n(state, 1)  # compile
    state = apply_n(state, 1)  # warm (first post-compile call can still pay
    float(state.step)          # one-time lazy costs on some backends)
    t0 = time.perf_counter()
    state = apply_n(state, 1)
    float(state.step)
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = apply_n(state, 1 + iters)
    float(state.step)
    dt = max((time.perf_counter() - t0 - base) / iters, 1e-9)
    return batch / dt, dt


def bench_sampling(n_rows=2_000_000, deg=32, batch=1 << 16, K=15, iters=8,
                   weighted=False, aligned=False):
    """Neighbor-sampling throughput (edges/s) — the reference's sampler
    bench dimension (cpp/tests/wholegraph_ops parameterized perf).

    Default CSR is UNALIGNED MIXED-DEGREE (deg/2..3*deg/2, mean ``deg``):
    the r3 bench's ``arange*32`` layout made every center satisfy the
    batch-global 1-block fast-path predicate by construction (start%128+deg
    <= 128 always), so the recorded number structurally rode the best case
    (VERDICT r3).  ``aligned=True`` keeps that layout for A/B against old
    rounds; the production number is the mixed one."""
    import numpy as np

    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    if aligned:
        row_ptr = jnp.arange(n_rows + 1, dtype=jnp.int32) * deg
        n_edges = n_rows * deg
    else:
        degs = np.random.RandomState(1).randint(
            deg // 2, deg + deg // 2 + 1, n_rows
        )
        rp = np.concatenate([[0], np.cumsum(degs)]).astype(np.int32)
        row_ptr = jnp.asarray(rp)
        n_edges = int(rp[-1])

    @jax.jit
    def make_col():
        return jax.random.randint(
            jax.random.PRNGKey(0), (n_edges,), 0, n_rows, dtype=jnp.int32
        )

    col = make_col()
    weights = cw = None
    if weighted:
        weights = jax.jit(
            lambda: jax.random.uniform(jax.random.PRNGKey(1), (n_edges,)) + 0.1
        )()
        # production weighted graphs carry the fused pair-block table
        # (GraphStructure.with_weighted_fastpath): one DMA per block serves
        # keys AND neighbor values
        from wholegraph_tpu.ops.sampling import interleave_col_weights

        cw = jax.jit(interleave_col_weights)(col, weights)

    def step(i, col, *w):
        centers = jax.random.randint(
            jax.random.PRNGKey(i), (batch,), 0, n_rows, dtype=jnp.int32
        )
        res = csr_sample_neighbors(
            row_ptr, col, centers, K, seed=0,
            weights=w[0] if w else None,
            # declared max_degree far above the actual: the degree ladders
            # (weight fetch + col block fetch) must keep the cost
            # proportional to the batch's real max
            max_degree=65536,
            cw_blocks=w[1] if w else None,
        )
        return res.neighbors[0, 0].astype(jnp.float32)

    args = (col, weights, cw) if weighted else (col,)
    dt = measure_median(step, iters, *args)
    return batch * K / dt, dt


def bench_spmm(num_src=1 << 17, batch=1 << 16, K=16, dim=256, iters=8):
    """Padded-neighborhood aggregation throughput (the SpMM of the sampled
    path; replaces cuGraph-Ops agg_concat_n2n)."""
    from wholegraph_tpu.ops.spmm import padded_reduce

    def step(i, x):
        nbr = jax.random.randint(
            jax.random.PRNGKey(i), (batch, K), 0, num_src, dtype=jnp.int32
        )
        out = padded_reduce(x, nbr, jnp.ones((batch, K), bool), "mean")
        return out[0, 0]

    x = jax.jit(lambda: jnp.ones((num_src, dim), jnp.float32))()
    dt = measure_median(step, iters, x)
    return batch * K / dt, dt


def bench_spmm_clustered(n=1 << 20, deg=16, dim=256, width=192, iters=6,
                         grad=False):
    """Full-graph SpMM over a LOCALITY-ORDERED CSR through the fused pallas
    windowed kernel (ops/spmm_pallas.py spmm_window): per destination tile,
    one window slab DMA + in-VMEM int8 one-hot adjacency build on the MXU +
    A @ window matmul, sidestepping BOTH the ~8 ns/edge DMA-descriptor floor
    of the random-edge padded path AND the HBM one-hot materialization that
    capped the XLA spmm_tiled at 14.9 Medges/s (DESIGN.md records)."""
    import numpy as np

    from wholegraph_tpu.ops.spmm import plan_spmm_tiles
    from wholegraph_tpu.ops.spmm_pallas import spmm_window

    rs = np.random.RandomState(0)
    counts = rs.randint(max(deg // 2, 1), deg * 2, n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, int(row_ptr[-1]))
    ).clip(0, n - 1).astype(np.int32)
    E = int(row_ptr[-1])
    tile = 256
    window, edge_cap, feasible = plan_spmm_tiles(row_ptr, col, tile=tile)
    rp_d, col_d = jnp.asarray(row_ptr), jnp.asarray(col)
    x = jax.jit(lambda: jnp.ones((n, dim), jnp.float32))()

    if grad:
        # fwd+bwd: the backward is the exact transposed XLA segment path
        # (spmm_pallas._sw_bwd) — this measures the documented asymmetry
        def step(i, rp_d, col_d, x):
            g = jax.grad(lambda x: jnp.sum(spmm_window(
                rp_d, col_d, x * (1.0 + i * 0.0), window=window,
                edge_cap=edge_cap, tile=tile, reduce="mean")))(x)
            # probe spans the full D axis: the bwd's per-edge take would
            # otherwise be lane-sliced by XLA through a scalar probe (rows
            # can't be sliced — segment identities are dynamic)
            return jnp.sum(g[0, :])
    else:
        def step(i, rp_d, col_d, x):
            out = spmm_window(
                rp_d, col_d, x * (1.0 + i * 0.0), window=window,
                edge_cap=edge_cap, tile=tile, reduce="mean",
            )
            return out[0, 0]

    dt = measure_median(step, iters, rp_d, col_d, x)
    return E / dt, dt


def bench_sddmm_clustered(n=1 << 20, deg=16, dim=256, width=192, iters=6,
                          select_mode="exact"):
    """Full-graph SDDMM over the same locality-ordered CSR through the
    fused pallas windowed kernel (ops/spmm_pallas.py sddmm_window): per dst
    tile ONE S = a @ window^T matmul + in-VMEM one-hot extraction, vs the
    XLA per-edge 2-row-gather sddmm."""
    import numpy as np

    from wholegraph_tpu.ops.spmm import plan_spmm_tiles
    from wholegraph_tpu.ops.spmm_pallas import sddmm_window

    rs = np.random.RandomState(0)
    counts = rs.randint(max(deg // 2, 1), deg * 2, n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, int(row_ptr[-1]))
    ).clip(0, n - 1).astype(np.int32)
    E = int(row_ptr[-1])
    tile = 256
    window, edge_cap, feasible = plan_spmm_tiles(row_ptr, col, tile=tile)
    rp_d, col_d = jnp.asarray(row_ptr), jnp.asarray(col)
    a = jax.jit(lambda: jnp.ones((n, dim), jnp.float32))()

    def step(i, rp_d, col_d, a):
        e = sddmm_window(
            rp_d, col_d, a * (1.0 + i * 0.0), a, window=window,
            edge_cap=edge_cap, tile=tile, select_mode=select_mode,
        )
        return e[0]

    dt = measure_median(step, iters, rp_d, col_d, a)
    return E / dt, dt


def bench_spmm_sampled(n=2_000_000, deg=16, width=192, dim=256, batch=1024,
                       fanouts=(10, 15), iters=6, windowed=True):
    """Sampled-block aggregation throughput on the TRAINING hot-path shape
    (VERDICT r4 #4: B=1024 fanouts 10/15 D=256): a real multilayer sample
    over a locality-ordered CSR, aggregating the deepest hop block over the
    gathered [U, D] unique rows.  ``windowed=True`` routes through
    padded_reduce_windowed (per-run windowed SpMM passes + exact edge
    residual); ``windowed=False`` is the descriptor-bound padded path."""
    import numpy as np

    from wholegraph_tpu.graph import GraphStructure
    from wholegraph_tpu.ops.spmm import padded_reduce, padded_reduce_windowed

    rs = np.random.RandomState(0)
    counts = rs.randint(max(deg // 2, 1), deg * 2, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(rp), col=jnp.asarray(col), node_count=n,
        edge_count=E, max_degree=int(counts.max()),
    )
    centers = jnp.asarray(
        np.sort(rs.choice(n, batch, replace=False)).astype(np.int32)
    )
    ml = jax.jit(
        lambda c: g.multilayer_sample(c, list(fanouts), seed=1)
    )(centers)
    L = len(fanouts) - 1
    hop = ml.hops[L]
    U = int(ml.unique_gids.shape[0])
    Eb = int(jnp.sum(hop.mask))  # real edges in the measured block
    x = jax.jit(lambda: jnp.ones((U, dim), jnp.float32))()
    rb = ml.run_bounds(L)
    # per-run windows: targets/new-run spans measured r5 ~26/256/2900 p90 at
    # this shape; cap 1024 — the scoped-VMEM calibration (spmm_pallas.py)
    # caps W*(2D+T) and 2048 measured 228 KB over the 16 MB limit at D=256
    # (exp_sampled_compile.log; the exact edge residual absorbs the extra
    # out-of-window tail)
    wins = tuple(min(-(-min(b2 - b1, 1024) // 128) * 128, 1024)
                 for b1, b2 in zip(rb, rb[1:]))
    nbr, msk = hop.nbr_idx, hop.mask

    on_tpu = jax.default_backend() == "tpu"

    def consume(out):
        # CPU smoke: jnp.take has no side effects — a scalar probe lets XLA
        # slice the whole batch away; consume a batch-spanning column
        return out[0, 0] if on_tpu else out[:, 0].sum()

    if windowed:
        def step(i, x, nbr, msk):
            out = padded_reduce_windowed(
                x * (1.0 + i * 0.0), nbr, msk, "mean",
                run_bounds=rb, windows=wins,
            )
            return consume(out)
    else:
        def step(i, x, nbr, msk):
            out = padded_reduce(x * (1.0 + i * 0.0), nbr, msk, "mean")
            return consume(out)

    dt = measure_median(step, iters, x, nbr, msk)
    return Eb / dt, dt


def bench_gat_layer(n=1 << 18, deg=16, dim_head=64, heads=4, width=192,
                    iters=6, fused=True, grad=False):
    """Full-graph GAT layer throughput over a locality-ordered CSR — the
    mha_gat_n2n analog (reference torch/cugraphops/gat_conv.py:73-101).
    ``fused=True`` routes through edge-softmax + per-head weighted windowed
    SpMM (attention grads via the windowed SDDMM dw); ``fused=False`` is
    the per-edge XLA path (2 D-dim row reads per edge) for the A/B.
    ``grad=True`` times forward+backward (value_and_grad wrt params+feats)
    instead of forward only."""
    import numpy as np

    from wholegraph_tpu.graph import GraphStructure
    from wholegraph_tpu.models.conv import GATConv

    rs = np.random.RandomState(0)
    counts = rs.randint(max(deg // 2, 1), deg * 2, n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(row_ptr[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr), col=jnp.asarray(col),
        node_count=n, edge_count=E, max_degree=int(counts.max()),
    )
    fg = g.to_full_graph(windowed=fused)
    if fused:
        assert fg.window is not None, "clustered CSR must yield a feasible plan"
    din = dim_head * heads
    feats = jax.jit(lambda: jnp.ones((n, din), jnp.float32))()
    layer = GATConv(out_dim=dim_head, num_heads=heads)
    params = layer.init(jax.random.PRNGKey(0), feats, fg)

    if grad:
        def step(i, params, feats):
            def loss(p, x):
                return jnp.sum(layer.apply(p, x * (1.0 + i * 0.0), fg))

            l, (dp, dx) = jax.value_and_grad(loss, argnums=(0, 1))(params, feats)
            return dx[0, 0] + l
    else:
        def step(i, params, feats):
            out = layer.apply(params, feats * (1.0 + i * 0.0), fg)
            return out[0, 0]

    # eager-repeat timing: the fori_loop chain program of this layer kills
    # the TPU worker (kernel fault — exp_gat_chain.py bisect) while the
    # same compiled step runs stably standalone; per-step scalar fetches
    # are tunnel-safe at this step size (>~100 ms >> RTT)
    dt = measure_eager(step, iters, params, feats)
    return E / dt, dt


def bench_train_step(n_nodes=2_000_000, deg=16, dim=256, batch=1024,
                     hidden=256, num_classes=16, iters=8,
                     assume_unique=True, unique_chunk=None,
                     dtype=jnp.float32):
    """End-to-end sampled train step: 2-layer SAGE, B=1024, TRAINABLE
    embedding (multilayer sample -> unique gather -> fwd/bwd -> dense adam +
    sparse LazyAdam apply) — the reference's per-iteration training cost
    ([EPOCH_TIME]/step, examples/node_classfication.py:112-122).

    ``assume_unique`` (default True — ``unique_gids`` carries the
    append_unique uniqueness contract) skips the apply's redundant dedup
    sort; ``unique_chunk`` opts into the chunked touched-rows-proportional
    apply (A/B knobs for the r5 sweep).

    Returns (ms_per_step, sol_fraction).  SoL proxy: the step's unavoidable
    HBM row moves = U unique rows x (2 gather + 2 grad write/read + 6
    optimizer moves) x dim x 4 B at HBM peak, where U is measured once from
    a probe batch — everything else (sampling, dense model) is assumed
    free.  Composes the very kernels the other metrics measure; this metric
    keeps the README's end-to-end row driver-verifiable."""
    import numpy as np
    import optax

    import wholegraph_tpu as wg
    from wholegraph_tpu.embedding import Embedding, create_optimizer
    from wholegraph_tpu.graph import GraphStructure
    from wholegraph_tpu.models import HomoGNN, cross_entropy_loss

    fanouts = (10, 15)
    degs = np.random.RandomState(1).randint(deg // 2, deg + deg // 2 + 1, n_nodes)
    rp = np.concatenate([[0], np.cumsum(degs)]).astype(np.int32)
    E = int(rp[-1])
    g = GraphStructure(
        row_ptr=jnp.asarray(rp),
        col=jax.jit(lambda: jax.random.randint(
            jax.random.PRNGKey(0), (E,), 0, n_nodes, dtype=jnp.int32))(),
        node_count=n_nodes, edge_count=E, max_degree=int(degs.max()),
    )
    mesh = wg.parallel.launch.init()
    emb = Embedding.create(mesh, n_nodes, dim, dtype=dtype,
                           optimizer=create_optimizer("lazy_adam"))
    estate = emb.init(jax.random.PRNGKey(0))
    labels_tab = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(2), (n_nodes,), 0, num_classes, dtype=jnp.int32))()
    model = HomoGNN(model_type="sage", hidden_dim=hidden,
                    num_classes=num_classes, num_layers=2)

    def sample_and_ids(centers, seed):
        ml = g.multilayer_sample(centers, list(fanouts), seed=seed)
        return ml, ml.unique_gids

    centers0 = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(3), (batch,), 0, n_nodes, dtype=jnp.int32))()
    ml0, ids0 = jax.jit(sample_and_ids)(centers0, 0)
    U = int(ids0.shape[0])
    rows0 = emb.gather(estate, ids0)
    params = model.init(jax.random.PRNGKey(0), rows0, sample=ml0)
    dense_opt = optax.adam(1e-3)
    opt_state0 = dense_opt.init(params)

    def body(i, params, estate, opt_state):
        centers = jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(4), i), (batch,), 0,
            n_nodes, dtype=jnp.int32)
        ml = g.multilayer_sample(centers, list(fanouts), seed=i)
        ids = ml.unique_gids
        labels = jnp.take(labels_tab, centers, mode="clip")
        rows = emb.gather(estate, ids) * ml.unique_mask[:, None]

        def loss_fn(p, r):
            return cross_entropy_loss(model.apply(p, r, sample=ml), labels)

        loss, (dp, dr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, rows)
        updates, opt_state = dense_opt.update(dp, opt_state, params)
        params = optax.apply_updates(params, updates)
        estate = emb.apply_gradients(
            estate, ids, dr, 1e-3, mask=ml.unique_mask,
            assume_unique=assume_unique, unique_chunk=unique_chunk,
        )
        return params, estate, opt_state, loss

    @jax.jit
    def chain(n, params, estate, opt_state):
        def step(i, carry):
            params, estate, opt_state, acc = carry
            ii, acc = jax.lax.optimization_barrier((i, acc))
            params, estate, opt_state, loss = body(ii, params, estate, opt_state)
            return params, estate, opt_state, acc + loss

        return jax.lax.fori_loop(
            0, n, step, (params, estate, opt_state, jnp.float32(0))
        )[3]

    import time as _time

    float(chain(1, params, estate, opt_state0))  # compile + warm
    t0 = _time.perf_counter()
    float(chain(1, params, estate, opt_state0))
    base = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    float(chain(1 + iters, params, estate, opt_state0))
    dt = max((_time.perf_counter() - t0 - base) / iters, 1e-9)

    sol_t = U * dim * 4 * 10 / (detect_hbm_gbps() * 1e9)
    return dt * 1e3, sol_t / dt


def bench_scaling(n_rows=500_000, dim=128, batch_per_dev=1 << 14, iters=6):
    """Weak-scaling efficiency of the distributed gather: edges-of-work/s on
    the full mesh vs world * single-device rate (the BASELINE >=80% target;
    reference multi-node bench sideband).  On a single chip this reports
    1.0 by construction; run on a pod (or the CPU virtual mesh) for a real
    number."""
    import numpy as np

    import wholegraph_tpu as wg
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.sharding import Mesh

    def rate(devices):
        world = len(devices)
        mesh = Mesh(np.asarray(devices), ("data",))
        table = wg.ShardedTable.create(mesh, n_rows, dim)
        B = batch_per_dev * world

        def step(i, data):
            ids = jax.random.randint(jax.random.PRNGKey(i), (B,), 0, n_rows)
            ids = jax.lax.with_sharding_constraint(
                ids, NamedSharding(mesh, P("data"))
            )
            rows = wg.ops.gather(data, ids, plan=table.plan, mesh=mesh)
            return rows[0, 0]

        dt = measure_median(step, iters, table.data)
        return B / dt

    devs = jax.devices()
    r1 = rate(devs[:1])
    if len(devs) == 1:
        return 1.0, r1
    rW = rate(devs)
    return rW / (len(devs) * r1), rW


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--metric",
        default="gather_sorted",
        choices=[
            "gather", "gather_random", "gather_sorted", "scatter", "apply",
            "sampling", "weighted_sampling", "spmm", "spmm_clustered",
            "spmm_sampled", "spmm_clustered_grad", "sddmm_clustered",
            "gat_layer", "gat_layer_grad",
            "scaling", "host_gather", "host_gather_sorted", "train_step",
        ],
        help="default gather_sorted: the production embedding-gather path on "
        "a deduped+sorted batch (what Embedding.gather receives from "
        "append_unique; the reference's sort/unique fast path, "
        "gather_op.cpp:118-120).  gather/gather_random: uniform unsorted ids "
        "through the single-row DMA ring (descriptor-rate bound, "
        "~8 ns/row hardware SoL — docs/DESIGN.md).",
    )
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default=None, choices=["f32", "bf16"],
                    help="gather_sorted/train_step: table dtype (bf16 = the "
                    "half-byte table path; gather_sorted then reports "
                    "f32-equivalent serving capacity).  Default: bf16 for "
                    "the gather_sorted HEADLINE (the production serving "
                    "config — reference half/bf16 table coverage, "
                    "tensor_description.h:29-40; r5 VERDICT named bf16 "
                    "bytes the one remaining headline lever), f32 "
                    "elsewhere.")
    ap.add_argument("--no-assume-unique", action="store_true",
                    help="train_step only: keep the apply's local dedup "
                    "sort even though unique_gids warrants uniqueness "
                    "(the r4 behavior, for the A/B)")
    ap.add_argument("--unique-chunk", type=int, default=0,
                    help="train_step only: chunked touched-rows-"
                    "proportional apply with this chunk size (multiple "
                    "of 1024); 0 = single-shot")
    ap.add_argument("--sddmm-mode", default="exact",
                    choices=["exact", "split2"],
                    help="sddmm_clustered only: row-select mode (exact = "
                    "bit-exact int8 byte planes; split2 = 2x bf16 hi+lo, "
                    "~2^-16 operand rounding — the gradient-consumer "
                    "config spmm_window's dw uses)")
    ap.add_argument("--sampled-padded", action="store_true",
                    help="spmm_sampled only: run the descriptor-bound "
                    "padded gather+reduce instead of the windowed block "
                    "aggregation, for the A/B")
    ap.add_argument("--gat-xla", action="store_true",
                    help="gat_layer metrics only: run the per-edge XLA path "
                    "(2 D-dim row reads per edge) instead of the fused "
                    "windowed path, for the A/B")
    ap.add_argument("--aligned-csr", action="store_true",
                    help="sampling metrics only: use the r3 aligned "
                    "arange*deg CSR (every center rides the 1-block fast "
                    "path by construction) instead of the honest unaligned "
                    "mixed-degree default")
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler trace of the measured "
                         "region into this directory (TensorBoard/xprof "
                         "format; SURVEY §5 tracing parity)")
    args = ap.parse_args()
    if args.dtype is None:
        args.dtype = "bf16" if args.metric == "gather_sorted" else "f32"
    if args.trace:
        import contextlib

        from wholegraph_tpu.utils.perf import trace as _trace

        stack = contextlib.ExitStack()
        stack.enter_context(_trace(args.trace))
        import atexit

        atexit.register(stack.close)

    backend = jax.default_backend()
    if backend == "cpu":
        # keep CPU smoke runs fast
        args.rows, args.batch, args.iters = 200_000, 1 << 14, 3

    sol_gbps = detect_hbm_gbps() / 2.0

    if args.metric in ("sampling", "weighted_sampling"):
        eps, dt = bench_sampling(
            n_rows=min(args.rows, 2_000_000), batch=min(args.batch, 1 << 16),
            iters=args.iters, weighted=args.metric == "weighted_sampling",
            aligned=args.aligned_csr,
        )
        print(json.dumps({
            "metric": f"{args.metric}_throughput",
            "value": round(eps / 1e6, 3),
            "unit": "Medges/s",
            "vs_baseline": round(eps * 4 / detect_hbm_gbps() / 1e9, 4),
        }))
        return
    if args.metric == "spmm":
        eps, dt = bench_spmm(batch=min(args.batch, 1 << 16), dim=args.dim,
                             iters=args.iters)
        sol_eps = detect_hbm_gbps() * 1e9 / (args.dim * 4)
        print(json.dumps({
            "metric": "spmm_throughput",
            "value": round(eps / 1e6, 3),
            "unit": "Medges/s",
            "vs_baseline": round(eps / sol_eps, 4),
        }))
        return
    if args.metric == "sddmm_clustered":
        n = 1 << 20 if backend == "tpu" else 1 << 14
        eps, dt = bench_sddmm_clustered(n=n, dim=args.dim, iters=args.iters,
                                        select_mode=args.sddmm_mode)
        # SoL proxy: one a-row + one b-row read per edge at full HBM rate
        sol_eps = detect_hbm_gbps() * 1e9 / (2 * args.dim * 4)
        print(json.dumps({
            "metric": "sddmm_clustered_throughput"
            + ("_split2" if args.sddmm_mode == "split2" else ""),
            "value": round(eps / 1e6, 3),
            "unit": "Medges/s",
            "vs_baseline": round(eps / sol_eps, 4),
        }))
        return
    if args.metric == "spmm_sampled":
        kw = dict(iters=args.iters, windowed=not args.sampled_padded)
        if backend == "cpu":
            kw.update(n=20_000, batch=128, fanouts=(4, 3))
        eps, dt = bench_spmm_sampled(dim=args.dim, **kw)
        sol_eps = detect_hbm_gbps() * 1e9 / (args.dim * 4)
        print(json.dumps({
            "metric": "spmm_sampled_throughput",
            "value": round(eps / 1e6, 3),
            "unit": "Medges/s",
            "vs_baseline": round(eps / sol_eps, 4),
        }))
        return
    if args.metric in ("gat_layer", "gat_layer_grad"):
        # n=256K (E~5M): at n=1M the per-edge XLA baseline fails to compile
        # (helper exit 1, every r5 sweep) — the A/B needs both sides alive.
        # grad: 128K — the value_and_grad program at 256K still kills the
        # compile helper (exit 1, r5b sweep)
        n = 1 << 18 if backend == "tpu" else 1 << 12
        if args.metric == "gat_layer_grad" and backend == "tpu":
            n = 1 << 17
        heads, dim_head = 4, 64
        eps, dt = bench_gat_layer(
            n=n, heads=heads, dim_head=dim_head, iters=args.iters,
            fused=not args.gat_xla, grad=args.metric == "gat_layer_grad",
        )
        # SoL proxy: one delivered per-head message row per edge at HBM rate
        sol_eps = detect_hbm_gbps() * 1e9 / (heads * dim_head * 4)
        print(json.dumps({
            "metric": f"{args.metric}_throughput",
            "value": round(eps / 1e6, 3),
            "unit": "Medges/s",
            "vs_baseline": round(eps / sol_eps, 4),
        }))
        return
    if args.metric in ("spmm_clustered", "spmm_clustered_grad"):
        n = 1 << 20 if backend == "tpu" else 1 << 14
        eps, dt = bench_spmm_clustered(
            n=n, dim=args.dim, iters=args.iters,
            grad=args.metric == "spmm_clustered_grad",
        )
        sol_eps = detect_hbm_gbps() * 1e9 / (args.dim * 4)
        print(json.dumps({
            "metric": f"{args.metric}_throughput",
            "value": round(eps / 1e6, 3),
            "unit": "Medges/s",
            "vs_baseline": round(eps / sol_eps, 4),
        }))
        return
    if args.metric == "scatter":
        gbps, dt = bench_scatter(args.rows, args.dim, args.batch, args.iters)
        print(json.dumps({
            "metric": "embedding_scatter_bandwidth",
            "value": round(gbps, 2),
            "unit": "GB/s",
            "vs_baseline": round(gbps / sol_gbps, 4),
        }))
        return
    if args.metric == "apply":
        rps, dt = bench_apply(
            n_rows=min(args.rows, 1_000_000), dim=args.dim,
            batch=min(args.batch, 1 << 17), iters=args.iters,
        )
        # SoL proxy: apply touches table+m+v rows read+write (6 row moves)
        sol_rps = detect_hbm_gbps() * 1e9 / (args.dim * 4 * 6)
        print(json.dumps({
            "metric": "embedding_apply_throughput",
            "value": round(rps / 1e6, 3),
            "unit": "Mrows/s",
            "vs_baseline": round(rps / sol_rps, 4),
        }))
        return
    if args.metric == "train_step":
        kw = dict(iters=args.iters)
        if backend == "cpu":
            kw = dict(n_nodes=50_000, batch=256, iters=3)
        kw["assume_unique"] = not args.no_assume_unique
        if args.unique_chunk:
            kw["unique_chunk"] = args.unique_chunk
        if args.dtype == "bf16":
            kw["dtype"] = jnp.bfloat16
        ms, solf = bench_train_step(**kw)
        print(json.dumps({
            "metric": "train_step_time",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(solf, 4),
        }))
        return
    if args.metric == "scaling":
        eff, rate = bench_scaling(iters=args.iters)
        print(json.dumps({
            "metric": "gather_scaling_efficiency",
            "value": round(eff, 4),
            "unit": "x",
            "vs_baseline": round(eff / 0.8, 4),  # >=1.0 meets the 80% target
        }))
        return
    if args.metric in ("host_gather", "host_gather_sorted"):
        from wholegraph_tpu.embedding.host_embedding import bench_host_gather

        gbps, dt = bench_host_gather(
            args.rows, args.dim, args.batch, args.iters,
            clustered=args.metric == "host_gather_sorted",
        )
        print(json.dumps({
            "metric": f"host_tier_{'gather_sorted' if 'sorted' in args.metric else 'gather'}_bandwidth",
            "value": round(gbps, 2),
            "unit": "GB/s",
            "vs_baseline": round(gbps / sol_gbps, 4),
        }))
        return

    if args.metric in ("gather", "gather_random"):
        gbps, dt = bench_gather(args.rows, args.dim, args.batch, args.iters)
        print(json.dumps({
            "metric": "embedding_gather_random_bandwidth",
            "value": round(gbps, 2),
            "unit": "GB/s",
            "vs_baseline": round(gbps / sol_gbps, 4),
        }))
        return

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    gbps, dt = bench_gather_sorted(args.rows, args.dim, args.batch, args.iters,
                                   dtype=dtype)
    if args.dtype == "bf16":
        # f32-EQUIVALENT serving capacity (rows/s x dim x 4 B): the same
        # logical embedding workload served from a half-byte table; actual
        # delivered bf16 bytes are gbps (= half this).  Same denominator as
        # the f32 headline, so the two are directly comparable.
        print(json.dumps({
            "metric": "embedding_gather_sorted_bf16_effective_bandwidth",
            "value": round(gbps * 2, 2),
            "unit": "GB/s",
            "vs_baseline": round(gbps * 2 / sol_gbps, 4),
        }))
        return
    print(json.dumps({
        "metric": "embedding_gather_sorted_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / sol_gbps, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the ONE-JSON-line contract
        # holds even when the backend is down (round-2's BENCH_r02 recorded
        # rc=1 with zero parseable output when the axon tunnel was wedged)
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "error",
            "value": 0,
            "unit": "",
            "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        sys.exit(1)

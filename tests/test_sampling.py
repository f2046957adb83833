"""Sampler tests: bit-exact host parity + statistical properties
(reference: cpp/tests/wholegraph_ops/*_sample_without_replacement_tests.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wholegraph_tpu.memory import ShardedTable
from wholegraph_tpu.ops import rng
from wholegraph_tpu.ops.sampling import csr_sample_neighbors

import host_sampler as hs


def test_rng_device_host_parity():
    a = np.arange(1000, dtype=np.uint32)
    b = np.full(1000, 7, np.uint32)
    dev = np.asarray(rng.rand_u32(123, jnp.asarray(a), jnp.asarray(b)))
    host = hs.rng.rand_u32_np(123, a, b)
    np.testing.assert_array_equal(dev, host)
    dev_i = np.asarray(rng.randint(9, jnp.asarray(a), jnp.asarray(b), jnp.full(1000, 17)))
    host_i = hs.rng.randint_np(9, a, b, np.full(1000, 17))
    np.testing.assert_array_equal(dev_i, host_i)


@pytest.mark.parametrize("K", [4, 10, 32])
def test_uniform_parity_vs_host(K):
    row_ptr, col = hs.random_csr(200, avg_deg=12, seed=1)
    centers = np.random.RandomState(2).randint(0, 200, 64)
    res = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K, seed=5, hop=1
    )
    h_nbrs, h_mask, h_pos = hs.sample_uniform_host(row_ptr, col, centers, K, seed=5, hop=1)
    np.testing.assert_array_equal(np.asarray(res.mask), h_mask)
    np.testing.assert_array_equal(np.asarray(res.positions) * h_mask, h_pos * h_mask)
    np.testing.assert_array_equal(np.asarray(res.neighbors) * h_mask, h_nbrs * h_mask)


def test_uniform_without_replacement_and_in_range():
    row_ptr, col = hs.random_csr(500, avg_deg=40, seed=3)
    centers = np.arange(128)
    K = 15
    res = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K, seed=0
    )
    pos = np.asarray(res.positions)
    mask = np.asarray(res.mask)
    deg = np.asarray(res.degree)
    for i in range(len(centers)):
        p = pos[i][mask[i]]
        assert len(np.unique(p)) == len(p), f"row {i} duplicate positions"
        assert (p >= 0).all() and (p < deg[i]).all()
        assert mask[i].sum() == min(deg[i], K)


def test_uniform_distribution():
    """Each neighbor of a degree-12 node should be picked ~uniformly."""
    n = 4
    row_ptr = np.array([0, 12, 12, 12, 12], np.int64)
    col = np.arange(12, dtype=np.int32)
    K = 6
    counts = np.zeros(12)
    for seed in range(150):
        res = csr_sample_neighbors(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.zeros(8, jnp.int32), K, seed=seed
        )
        sel = np.asarray(res.neighbors)[0][np.asarray(res.mask)[0]]
        counts[sel] += 1
    freq = counts / counts.sum()
    assert np.abs(freq - 1 / 12).max() < 0.03, freq


def test_weighted_parity_vs_host():
    row_ptr, col = hs.random_csr(150, avg_deg=20, seed=4, max_deg=600)
    weights = (np.random.RandomState(5).rand(row_ptr[-1]) + 0.1).astype(np.float32)
    centers = np.random.RandomState(6).randint(0, 150, 32)
    K = 8
    res = csr_sample_neighbors(
        jnp.asarray(row_ptr),
        jnp.asarray(col),
        jnp.asarray(centers),
        K,
        seed=11,
        hop=2,
        weights=jnp.asarray(weights),
        max_degree=600,
    )
    h_nbrs, h_mask, h_pos = hs.sample_weighted_host(
        row_ptr, col, weights, centers, K, seed=11, hop=2
    )
    np.testing.assert_array_equal(np.asarray(res.mask), h_mask)
    np.testing.assert_array_equal(np.asarray(res.positions) * h_mask, h_pos * h_mask)


def test_weighted_degree_ladder_bit_equal():
    """The lax.switch degree ladder must be bit-identical whatever the
    declared graph max_degree: a low-degree batch on a graph declared with a
    huge max_degree runs a small ladder level yet returns exactly the same
    sample (the chunks it skips hold only -inf keys)."""
    row_ptr, col = hs.random_csr(200, avg_deg=12, seed=9, max_deg=100)
    weights = (np.random.RandomState(10).rand(row_ptr[-1]) + 0.05).astype(np.float32)
    centers = np.random.RandomState(11).randint(0, 200, 64)
    K = 6
    outs = []
    for declared_md in (100, 4096, 65536):  # 1, ~8, ~128 chunk levels
        res = csr_sample_neighbors(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K,
            seed=13, hop=1, weights=jnp.asarray(weights), max_degree=declared_md,
        )
        outs.append((np.asarray(res.neighbors), np.asarray(res.mask),
                     np.asarray(res.positions)))
    for nb, mk, ps in outs[1:]:
        np.testing.assert_array_equal(nb, outs[0][0])
        np.testing.assert_array_equal(mk, outs[0][1])
        np.testing.assert_array_equal(ps, outs[0][2])


def test_weighted_ladder_covers_high_degree_tail(mesh8):
    """A batch containing one genuinely high-degree center still samples it
    correctly (the ladder picks a level covering the tail)."""
    n = 64
    deg_hi = 3000
    degs = np.full(n, 4)
    degs[7] = deg_hi  # power-law-ish outlier
    row_ptr = np.concatenate([[0], np.cumsum(degs)]).astype(np.int64)
    E = row_ptr[-1]
    col = np.random.RandomState(12).randint(0, n, E).astype(np.int32)
    weights = np.ones(E, np.float32)
    weights[row_ptr[7] : row_ptr[7] + 5] = 1000.0  # 5 dominant edges
    res = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col),
        jnp.asarray(np.array([7] * 8, np.int32)), 5,
        seed=3, weights=jnp.asarray(weights), max_degree=deg_hi,
    )
    pos = np.asarray(res.positions)[0]
    mask = np.asarray(res.mask)[0]
    assert mask.all()
    # heavy edges dominate, and positions beyond the first 512-chunk appear
    # (proof the ladder actually covered the high-degree tail)
    assert (pos < 5).sum() >= 2, pos
    any_tail = False
    for s in range(6):
        r = csr_sample_neighbors(
            jnp.asarray(row_ptr), jnp.asarray(col),
            jnp.asarray(np.array([7] * 8, np.int32)), 5,
            seed=s, weights=jnp.asarray(weights), max_degree=deg_hi,
        )
        any_tail |= bool((np.asarray(r.positions)[0] >= 512).any())
    assert any_tail


def test_weighted_bias():
    """Heavier edges must be sampled more often (A-Res property)."""
    row_ptr = np.array([0, 10], np.int64)
    col = np.arange(10, dtype=np.int32)
    weights = np.array([10.0] * 2 + [0.1] * 8, np.float32)
    hits = np.zeros(10)
    for seed in range(100):
        res = csr_sample_neighbors(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.zeros(8, jnp.int32), 3,
            seed=seed, weights=jnp.asarray(weights), max_degree=16,
        )
        sel = np.asarray(res.neighbors)[0][np.asarray(res.mask)[0]]
        hits[sel] += 1
    assert hits[:2].mean() > 4 * hits[2:].mean(), hits


def test_distributed_csr_matches_replicated(mesh8):
    """ShardedTable CSR (the NCCL-path analog) must reproduce the replicated
    result exactly — sampling keys on node id, not layout."""
    row_ptr, col = hs.random_csr(256, avg_deg=10, seed=7)
    centers = np.random.RandomState(8).randint(0, 256, 64)
    K = 8
    rep = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K, seed=3
    )
    ptr_t = ShardedTable.from_array(mesh8, row_ptr)
    col_t = ShardedTable.from_array(mesh8, col)
    ctr = jax.device_put(jnp.asarray(centers), NamedSharding(mesh8, P("data")))
    dist = csr_sample_neighbors(
        ptr_t, col_t, ctr, K, seed=3, gather_kwargs={"method": "allgather"}
    )
    np.testing.assert_array_equal(np.asarray(dist.mask), np.asarray(rep.mask))
    np.testing.assert_array_equal(
        np.asarray(dist.neighbors) * np.asarray(dist.mask),
        np.asarray(rep.neighbors) * np.asarray(rep.mask),
    )


def test_sample_under_jit():
    row_ptr, col = hs.random_csr(100, avg_deg=8, seed=9)

    @jax.jit
    def f(centers):
        r = csr_sample_neighbors(jnp.asarray(row_ptr), jnp.asarray(col), centers, 5, seed=1)
        return r.neighbors, r.mask

    centers = jnp.asarray(np.arange(32))
    n1, m1 = f(centers)
    h_nbrs, h_mask, _ = hs.sample_uniform_host(row_ptr, col, np.arange(32), 5, seed=1)
    np.testing.assert_array_equal(np.asarray(m1), h_mask)


def test_weighted_block_paths_bitequal_element_path_cpu():
    """Run the TPU block ladder AND its single-shot 2-block fast path on CPU
    by stubbing the pallas block fetch with its jnp.take equivalent: both
    must select bit-identical (positions, mask) to the element-fetch ladder
    (the host-replayable reference path)."""
    from unittest import mock

    import wholegraph_tpu.ops.gather_pallas as gp
    from wholegraph_tpu.ops.sampling import _sample_positions_weighted

    rs = np.random.RandomState(17)
    n, K = 4000, 9
    deg_np = rs.randint(1, 60, n).astype(np.int32)  # low-degree: fast path
    row_ptr = np.concatenate([[0], np.cumsum(deg_np)]).astype(np.int32)
    E = int(row_ptr[-1])
    weights = jnp.asarray(rs.rand(E).astype(np.float32) + 0.05)
    B = 512
    centers = jnp.asarray(rs.randint(0, n, B).astype(np.int32))
    start = jnp.asarray(row_ptr[:-1])[centers]
    deg = jnp.asarray(deg_np)[centers]

    ref_pos, ref_mask = _sample_positions_weighted(
        start, deg, K, 3, centers, 1, weights, 4096
    )

    def fake_gather3(table, ids, **kw):
        out = jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)
        return out.reshape(out.shape[0], *([1] * (3 - out.ndim)), -1) if out.ndim < 3 else out

    with mock.patch.object(gp, "_gather_rows_pallas3_impl", fake_gather3), \
         mock.patch(
             "wholegraph_tpu.ops.sampling.jax.default_backend",
             return_value="tpu",
         ):
        # low-degree batch: exercises the single-shot 2-block branch
        pos_fast, mask_fast = _sample_positions_weighted(
            start, deg, K, 3, centers, 1, weights, 4096
        )
        # force at least one center past the 2-block span: ladder branch
        deg_hi = deg.at[0].set(jnp.int32(700))
        pos_l, mask_l = _sample_positions_weighted(
            start, deg_hi, K, 3, centers, 1, weights, 4096
        )
    np.testing.assert_array_equal(np.asarray(mask_fast), np.asarray(ref_mask))
    np.testing.assert_array_equal(np.asarray(pos_fast), np.asarray(ref_pos))
    # ladder run: centers 1.. unchanged must match the reference exactly
    np.testing.assert_array_equal(
        np.asarray(mask_l)[1:], np.asarray(ref_mask)[1:]
    )
    np.testing.assert_array_equal(np.asarray(pos_l)[1:], np.asarray(ref_pos)[1:])


def test_weighted_single_shot_1blk_bitequal_cpu():
    """Constant degree 8 with 8-aligned starts keeps every center's span
    inside ONE 128-lane block (s_lane + deg <= 128), forcing the 1-block
    single-shot branch: positions/mask must be bit-identical to the
    element-fetch reference ladder."""
    from unittest import mock

    import wholegraph_tpu.ops.gather_pallas as gp
    from wholegraph_tpu.ops.sampling import _sample_positions_weighted

    rs = np.random.RandomState(31)
    n, K, d = 3000, 5, 8
    row_ptr = np.arange(n + 1, dtype=np.int32) * d
    E = n * d
    weights = jnp.asarray(rs.rand(E).astype(np.float32) + 0.05)
    B = 512
    centers = jnp.asarray(rs.randint(0, n, B).astype(np.int32))
    start = jnp.asarray(row_ptr[:-1])[centers]
    deg = jnp.full((B,), d, jnp.int32)

    ref_pos, ref_mask = _sample_positions_weighted(
        start, deg, K, 7, centers, 0, weights, 1024
    )

    def fake_gather3(table, ids, **kw):
        out = jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)
        return out[:, None, :] if out.ndim == 2 else out

    with mock.patch.object(gp, "_gather_rows_pallas3_impl", fake_gather3), \
         mock.patch(
             "wholegraph_tpu.ops.sampling.jax.default_backend",
             return_value="tpu",
         ):
        pos1, mask1 = _sample_positions_weighted(
            start, deg, K, 7, centers, 0, weights, 1024
        )
    np.testing.assert_array_equal(np.asarray(mask1), np.asarray(ref_mask))
    np.testing.assert_array_equal(np.asarray(pos1), np.asarray(ref_pos))


def test_weighted_bucketed_dispatch_bitequal_cpu():
    """With _WEIGHTED_BUCKETS=4 (opt-in since r4 — G=1 measured faster on
    tight need spreads) B>=4096 routes through the degree-bucketed dispatch
    (4 buckets, per-bucket ladder levels): results must stay bit-identical
    to the element-fetch reference ladder on a mixed-degree batch."""
    from unittest import mock

    import wholegraph_tpu.ops.gather_pallas as gp
    import wholegraph_tpu.ops.sampling as S
    from wholegraph_tpu.ops.sampling import _sample_positions_weighted

    rs = np.random.RandomState(23)
    n, K, B = 6000, 7, 4096
    # mixed degrees: mostly tiny, a few huge (the skew case)
    deg_np = rs.randint(1, 24, n).astype(np.int32)
    deg_np[rs.choice(n, 25, replace=False)] = rs.randint(300, 900, 25)
    row_ptr = np.concatenate([[0], np.cumsum(deg_np)]).astype(np.int32)
    E = int(row_ptr[-1])
    weights = jnp.asarray(rs.rand(E).astype(np.float32) + 0.05)
    centers = jnp.asarray(rs.randint(0, n, B).astype(np.int32))
    start = jnp.asarray(row_ptr[:-1])[centers]
    deg = jnp.asarray(deg_np)[centers]

    ref_pos, ref_mask = _sample_positions_weighted(
        start, deg, K, 5, centers, 2, weights, 2048
    )

    def fake_gather3(table, ids, **kw):
        out = jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)
        return out[:, None, :] if out.ndim == 2 else out

    with mock.patch.object(gp, "_gather_rows_pallas3_impl", fake_gather3), \
         mock.patch.object(S, "_WEIGHTED_BUCKETS", 4), \
         mock.patch(
             "wholegraph_tpu.ops.sampling.jax.default_backend",
             return_value="tpu",
         ):
        pos_b, mask_b = _sample_positions_weighted(
            start, deg, K, 5, centers, 2, weights, 2048
        )
    np.testing.assert_array_equal(np.asarray(mask_b), np.asarray(ref_mask))
    np.testing.assert_array_equal(np.asarray(pos_b), np.asarray(ref_pos))


def test_weighted_fused_pair_blocks_bitequal_cpu():
    """The fused pair-block path (cw_blocks: one DMA serves keys AND
    neighbor values, no separate col fetch) must return bit-identical
    SampleResults to the unfused path across the single-shot(1),
    single-shot(2) and ladder regimes — including masked slots, positions
    and edge ids."""
    from wholegraph_tpu.ops.sampling import (
        csr_sample_neighbors,
        interleave_col_weights,
    )

    rs = np.random.RandomState(41)
    for tag, lo, hi, nheavy in [
        ("1blk", 4, 9, 0),       # deg<=8, aligned-ish: mostly 1-block
        ("2blk", 16, 49, 0),     # honest mixed: 2-block single shot
        ("ladder", 16, 49, 20),  # heavy tail forces the ladder
    ]:
        n, K, B = 4000, 6, 1024
        deg_np = rs.randint(lo, hi, n).astype(np.int32)
        if nheavy:
            deg_np[rs.choice(n, nheavy, replace=False)] = rs.randint(
                600, 1500, nheavy
            )
        row_ptr = np.concatenate([[0], np.cumsum(deg_np)]).astype(np.int32)
        E = int(row_ptr[-1])
        col = jnp.asarray(rs.randint(0, n, E).astype(np.int32))
        weights = jnp.asarray(rs.rand(E).astype(np.float32) + 0.05)
        centers = jnp.asarray(rs.randint(0, n, B).astype(np.int32))
        rp = jnp.asarray(row_ptr)

        ref = csr_sample_neighbors(
            rp, col, centers, K, seed=9, hop=1, weights=weights,
            max_degree=2048,
        )
        cw = interleave_col_weights(col, weights)
        got = csr_sample_neighbors(
            rp, col, centers, K, seed=9, hop=1, weights=weights,
            max_degree=2048, cw_blocks=cw,
        )
        for field in ("neighbors", "mask", "positions", "edge_ids"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, field)),
                np.asarray(getattr(ref, field)),
                err_msg=f"{tag}:{field}",
            )


def test_graph_weighted_fastpath_multilayer_bitequal_cpu():
    """GraphStructure.with_weighted_fastpath() plumbs cw_blocks through
    multilayer_sample: identical MultilayerSample to the plain graph."""
    from wholegraph_tpu.graph import GraphStructure

    rs = np.random.RandomState(5)
    n, E = 600, 9000
    src = rs.randint(0, n, E)
    dst = rs.randint(0, n, E)
    w = rs.rand(E).astype(np.float32) + 0.1
    g = GraphStructure.from_coo(src, dst, n, edge_weight=w)
    gf = g.with_weighted_fastpath()
    centers = jnp.asarray(rs.randint(0, n, 64).astype(np.int32))
    a = g.multilayer_sample(centers, [4, 3], seed=3, weighted=True)
    b = gf.multilayer_sample(centers, [4, 3], seed=3, weighted=True)
    np.testing.assert_array_equal(
        np.asarray(a.unique_gids), np.asarray(b.unique_gids)
    )
    for ha, hb in zip(a.hops, b.hops):
        np.testing.assert_array_equal(
            np.asarray(ha.nbr_idx), np.asarray(hb.nbr_idx)
        )
        np.testing.assert_array_equal(np.asarray(ha.mask), np.asarray(hb.mask))


def test_col_fetch_slab_select_bitequal_cpu():
    """The r5 block col fetch (slab DMA + fused pallas lane select behind
    the nb-block lax.switch, block ladder for the wide tail) must return
    exactly the element-path cols — run on CPU by stubbing the three
    pallas entry points (slab gather, ring gather, lane select) with
    jnp.take replicas; backend mocked to tpu."""
    from unittest import mock

    import wholegraph_tpu.ops.gather_pallas as gp
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    rs = np.random.RandomState(41)
    n = 8000
    # mixed degrees + a tail forcing the ladder / element sides; centers at
    # the table end exercise the slab clamp+shift
    deg = rs.randint(1, 30, n)
    deg[rs.choice(n, 40, replace=False)] = rs.randint(200, 500, 40)
    row_ptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    col = rs.randint(0, n, int(row_ptr[-1])).astype(np.int32)
    centers = np.concatenate(
        [rs.randint(0, n, 4088), np.arange(n - 8, n)]
    ).astype(np.int32)
    K = 7

    ref = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K,
        seed=2,
    )

    def fake_gather3(table, ids, **kw):
        out = jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)
        return out[:, None, :] if out.ndim == 2 else out

    def fake_slabs(c2, blk_start, nb, **kw):
        B = blk_start.shape[0]
        bids = blk_start[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
        return jnp.take(c2, bids.reshape(-1), axis=0).reshape(B, nb * 128)

    def fake_select(lanes, loc, K_, **kw):
        S = lanes.shape[1]
        inr = (loc >= 0) & (loc < S)
        sel = jnp.take_along_axis(lanes, jnp.clip(loc, 0, S - 1), axis=1)
        return jnp.where(inr, sel, 0)[:, :K_]

    # narrow-degree CSR: engages the nb-block switch (span <= 256 lanes)
    deg2 = rs.randint(1, 30, n)
    rp2 = np.concatenate([[0], np.cumsum(deg2)]).astype(np.int32)
    col2 = rs.randint(0, n, int(rp2[-1])).astype(np.int32)
    ref2 = csr_sample_neighbors(
        jnp.asarray(rp2), jnp.asarray(col2), jnp.asarray(centers), K, seed=3,
    )

    with mock.patch.object(gp, "_gather_rows_pallas3_impl", fake_gather3), \
         mock.patch.object(gp, "gather_lane_slabs_pallas", fake_slabs), \
         mock.patch.object(gp, "select_lanes_pallas", fake_select), \
         mock.patch(
             "wholegraph_tpu.ops.sampling.jax.default_backend",
             return_value="tpu",
         ):
        res = csr_sample_neighbors(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K,
            seed=2, max_degree=1024,
        )
        res2 = csr_sample_neighbors(
            jnp.asarray(rp2), jnp.asarray(col2), jnp.asarray(centers), K,
            seed=3, max_degree=1024,
        )
    for got, want in ((res, ref), (res2, ref2)):
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(want.mask))
        np.testing.assert_array_equal(
            np.asarray(got.positions), np.asarray(want.positions)
        )
        np.testing.assert_array_equal(
            np.asarray(got.neighbors), np.asarray(want.neighbors)
        )

"""Pallas kernel tests — only run on a real TPU backend (the CPU suite forces
jax_platforms=cpu, so these skip there; run manually with
``PYTHONPATH=. python -m pytest tests/test_pallas_tpu.py`` on a TPU host)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU backend"
)


def test_gather_rows_pallas_correct():
    from wholegraph_tpu.ops.gather_pallas import gather_rows_pallas

    N, D, B = 100_000, 256, 4096
    table = jax.jit(
        lambda: jnp.arange(N, dtype=jnp.float32)[:, None] * jnp.ones((1, D))
    )()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, N, B).astype(np.int32))
    out = gather_rows_pallas(table, ids)
    np.testing.assert_array_equal(
        np.asarray(out[:, 0]).astype(np.int64), np.asarray(ids)
    )


def test_scatter_rows_pallas_correct():
    from wholegraph_tpu.ops.gather_pallas import scatter_rows_pallas

    N, D, B = 50_000, 128, 2048
    table = jax.jit(lambda: jnp.zeros((N, D), jnp.float32))()
    ids_np = np.random.RandomState(1).choice(N, B, replace=False).astype(np.int32)
    ids = jnp.asarray(ids_np)
    rows = jnp.asarray(
        np.arange(B, dtype=np.float32)[:, None] * np.ones((1, D), np.float32)
    )
    out = scatter_rows_pallas(table, ids, rows)
    got = np.asarray(out)
    np.testing.assert_array_equal(got[ids_np, 0], np.arange(B, dtype=np.float32))
    untouched = np.setdiff1d(np.arange(N), ids_np)[:1000]
    assert (got[untouched] == 0).all()


def test_local_take_dispatches_pallas():
    from wholegraph_tpu.ops.gather import local_take

    N, D, B = 10_000, 256, 8192
    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()
    slots = jnp.asarray(np.random.RandomState(2).randint(0, N, B).astype(np.int32))
    out = local_take(table, slots)
    assert out.shape == (B, D)
    assert float(out[0, 0]) == 1.0
    # OOB slots clamp (clip semantics)
    out2 = local_take(table, jnp.full((B,), N + 100, jnp.int32))
    assert float(out2[0, 0]) == 1.0


def test_gather_rows_pallas3_and_grad():
    from wholegraph_tpu.ops.gather_pallas import gather_rows_pallas3

    N, D, B = 50_000, 256, 2048
    table = jax.jit(
        lambda: jnp.arange(N, dtype=jnp.float32)[:, None] * jnp.ones((1, D))
    )()
    ids = jnp.asarray(np.random.RandomState(3).randint(0, N, B).astype(np.int32))
    out3 = gather_rows_pallas3(table, ids)
    assert out3.shape == (B, D // 128, 128)
    np.testing.assert_array_equal(
        np.asarray(out3[:, 0, 0]).astype(np.int64), np.asarray(ids)
    )
    # gradient: sum of gathered rows -> table grad counts occurrences
    g = jax.grad(lambda t: gather_rows_pallas3(t, ids).sum())(table)
    counts = np.bincount(np.asarray(ids), minlength=N)
    np.testing.assert_array_equal(np.asarray(g[:, 0]), counts * 1.0)


def test_padded_reduce_tpu_fast_path():
    from wholegraph_tpu.ops.spmm import padded_reduce

    U, D, B, K = 20_000, 256, 512, 10
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(U, D).astype(np.float32))
    nbr = jnp.asarray(rs.randint(0, U, (B, K)).astype(np.int32))
    mask = jnp.asarray(rs.rand(B, K) > 0.3)
    out = np.asarray(padded_reduce(x, nbr, mask, "mean"))
    xn, nn, mn = np.asarray(x), np.asarray(nbr), np.asarray(mask)
    for i in range(0, B, 97):
        sel = xn[nn[i][mn[i]]]
        e = sel.mean(0) if len(sel) else np.zeros(D)
        np.testing.assert_allclose(out[i], e, rtol=1e-4, atol=1e-5)


def test_fused_padded_sum_correct_and_grad():
    """SpMM v2: the fused DMA-ring + VMEM-accumulate kernel matches the
    dense masked reduce, including masked-slot DMA skipping and the VJP."""
    from wholegraph_tpu.ops.spmm_pallas import fused_padded_sum

    U, D, B, K = 30_000, 256, 777, 13  # odd B/K: exercises block padding
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(U, D).astype(np.float32))
    nbr = jnp.asarray(rs.randint(0, U, (B, K)).astype(np.int32))
    mask = jnp.asarray(rs.rand(B, K) > 0.4)
    out = np.asarray(fused_padded_sum(x, nbr, mask))
    xn, nn, mn = np.asarray(x), np.asarray(nbr), np.asarray(mask)
    for i in range(0, B, 61):
        e = xn[nn[i][mn[i]]].sum(0) if mn[i].any() else np.zeros(D)
        np.testing.assert_allclose(out[i], e, rtol=1e-4, atol=1e-4)
    # VJP: d/dx of sum(out) counts each node's masked occurrences
    g = jax.grad(lambda t: fused_padded_sum(t, nbr, mask).sum())(x)
    counts = np.bincount(nn[mn].reshape(-1), minlength=U)
    np.testing.assert_allclose(np.asarray(g[:, 0]), counts * 1.0, rtol=1e-5)


def test_sampler_element_fetch_parity():
    """The TPU element-fetch fast path must keep the sampler bit-exact vs
    the host replay (large batch to trigger the pallas path)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from wholegraph_tpu.testing import host_sample_uniform, random_csr
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    row_ptr, col = random_csr(2000, avg_deg=12, seed=1)
    centers = np.tile(np.arange(1000), 2)[:1024]
    K = 8  # 1024*8 = 8192 edges -> pallas fetch path
    res = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K, seed=5
    )
    h_nbrs, h_mask, _ = host_sample_uniform(row_ptr, col, centers, K, seed=5)
    np.testing.assert_array_equal(np.asarray(res.mask), h_mask)
    np.testing.assert_array_equal(
        np.asarray(res.neighbors) * h_mask, h_nbrs * h_mask
    )


def test_weighted_sampling_parity_tpu():
    """Weighted A-Res sampler on real TPU hardware: bit-exact vs the host
    replay, through the degree-ladder lax.switch (r1 weak #5)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from wholegraph_tpu.testing import host_sample_weighted, random_csr
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    row_ptr, col = random_csr(300, avg_deg=18, seed=7, max_deg=900)
    weights = (np.random.RandomState(8).rand(row_ptr[-1]) + 0.1).astype(np.float32)
    centers = np.random.RandomState(9).randint(0, 300, 64)
    K = 6
    res = csr_sample_neighbors(
        jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K,
        seed=21, hop=1, weights=jnp.asarray(weights),
        max_degree=16384,  # forces a multi-level ladder
    )
    h_nbrs, h_mask, h_pos = host_sample_weighted(
        row_ptr, col, weights, centers, K, seed=21, hop=1
    )
    np.testing.assert_array_equal(np.asarray(res.mask), h_mask)
    np.testing.assert_array_equal(np.asarray(res.positions) * h_mask, h_pos * h_mask)


def test_host_dma_masked_gather_scatter():
    """Pinned-host pallas DMA path (device_cached_host cold fetch): masked
    gather from and scatter to a pltpu.MemorySpace.HOST memref."""
    from jax.sharding import SingleDeviceSharding

    from wholegraph_tpu.ops.gather_pallas import gather_rows_masked, scatter_rows_masked

    dev = jax.devices()[0]
    N, D, B = 50_000, 256, 2048
    table = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    table_h = jax.device_put(table, SingleDeviceSharding(dev, memory_kind="pinned_host"))
    rs = np.random.RandomState(1)
    slots = rs.randint(0, N, B).astype(np.int32)
    slots[::3] = -1  # masked: skipped DMAs, garbage rows
    out = gather_rows_masked(table_h, jnp.asarray(slots), host_table=True)
    valid = slots >= 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(table)[slots[valid]], rtol=1e-6
    )
    # scatter back: masked slots untouched
    uniq = np.unique(slots[valid])[:512].astype(np.int32)
    wslots = np.full(1024, -1, np.int32)
    wslots[: len(uniq)] = uniq
    rows = jnp.ones((1024, D), jnp.float32) * 7.0
    new_h = scatter_rows_masked(table_h, jnp.asarray(wslots), rows, host_table=True)
    got = np.asarray(jax.device_get(new_h))
    np.testing.assert_allclose(got[uniq], 7.0)
    untouched = np.setdiff1d(np.arange(N), uniq)[:500]
    np.testing.assert_allclose(got[untouched], np.asarray(table)[untouched], rtol=1e-6)


def test_gather_rows_pallas_bf16():
    from wholegraph_tpu.ops.gather_pallas import gather_rows_pallas

    N, D, B = 60_000, 256, 2048
    table = jax.jit(
        lambda: (jnp.arange(N, dtype=jnp.float32)[:, None] % 256 * jnp.ones((1, D))).astype(
            jnp.bfloat16
        )
    )()
    ids = jnp.asarray(np.random.RandomState(5).randint(0, N, B).astype(np.int32))
    out = gather_rows_pallas(table, ids)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out[:, 0]).astype(np.int64), np.asarray(ids) % 256
    )


def test_gather_rows_window_bitexact():
    """Windowed multi-row-DMA gather: bit-exact vs take for in-window sorted
    ids, f32 (Precision.HIGHEST one-hot) and bf16."""
    from wholegraph_tpu.ops.gather_pallas import gather_rows_window, window_coverage

    N, D, B = 200_000, 256, 8192
    rng = np.random.RandomState(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        table = jax.jit(
            lambda: (jax.random.normal(jax.random.PRNGKey(7), (N, D)) * 50).astype(
                dtype
            )
        )()
        start = 12_345
        ids = np.sort(start + rng.choice(40_000, B, replace=False)).astype(np.int32)
        ids = jnp.asarray(ids)
        cov, _ = window_coverage(ids, N, tile=256, window=2048)
        out = gather_rows_window(table, ids, tile=256, window=2048)
        ref = jnp.take(table, ids, axis=0)
        outn, refn = np.asarray(out), np.asarray(ref)
        covered = np.asarray(
            (ids.reshape(-1, 256) - np.asarray(
                np.clip((ids.reshape(-1, 256)[:, :1] // 32) * 32, 0, None))) < 2048
        ).reshape(-1)
        np.testing.assert_array_equal(outn[covered], refn[covered])
        assert float(cov) > 0.9


def test_local_take_sorted_exact_any_coverage():
    """local_take_sorted repairs out-of-window ids: exact even for ids that
    violate the window contract (huge jumps inside a tile)."""
    from wholegraph_tpu.ops.gather_pallas import local_take_sorted

    N, D, B = 300_000, 128, 8192
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(9), (N, D))
    )()
    rng = np.random.RandomState(4)
    # sorted but LOW density: spans far exceed any window
    ids = np.sort(rng.randint(0, N, B)).astype(np.int32)
    out = local_take_sorted(table, jnp.asarray(ids))
    ref = jnp.take(table, jnp.asarray(ids), axis=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # and a dense batch
    ids2 = np.sort(1000 + rng.choice(9000, B, replace=False)).astype(np.int32)
    out2 = local_take_sorted(table, jnp.asarray(ids2))
    ref2 = jnp.take(table, jnp.asarray(ids2), axis=0)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))

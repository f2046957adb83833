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


def test_col_block_fetch_matches_element_path():
    """The per-center block-cover col fetch (engaged when a static
    max_degree is declared) must return exactly what the per-element path
    returns — positions don't depend on max_degree, so the two
    csr_sample_neighbors calls differ only in the col-fetch kernel."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from wholegraph_tpu.testing import random_csr
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    row_ptr, col = random_csr(2000, avg_deg=12, seed=3)
    centers = np.random.RandomState(4).randint(0, 2000, 1024)
    args = (jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), 8)
    res_e = csr_sample_neighbors(*args, seed=9)  # no max_degree -> element
    res_b = csr_sample_neighbors(*args, seed=9, max_degree=4096)  # block
    np.testing.assert_array_equal(np.asarray(res_e.mask), np.asarray(res_b.mask))
    np.testing.assert_array_equal(
        np.asarray(res_e.positions), np.asarray(res_b.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(res_e.neighbors), np.asarray(res_b.neighbors)
    )


def test_weighted_sampling_parity_tpu():
    """Weighted A-Res sampler on real TPU hardware vs the host replay,
    through the degree-ladder lax.switch (r1 weak #5).

    Unlike the CPU mesh (bit-exact, tests/test_sampling.py), TPU `log` differs
    from numpy's in final ULPs, so top-K ranks may flip between near-tie keys.
    The test therefore asserts rank parity UP TO ULP-level key ties: any
    position that differs from the host replay must carry a host-side key
    within 5e-4 relative of the host pick at the same rank (TPU log error
    measured up to ~1e-4 relative on the key)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from wholegraph_tpu.testing import host_sample_weighted, random_csr
    from wholegraph_tpu.ops import rng
    from wholegraph_tpu.ops.sampling import _HOP_STRIDE, csr_sample_neighbors

    row_ptr, col = random_csr(300, avg_deg=18, seed=7, max_deg=900)
    weights = (np.random.RandomState(8).rand(row_ptr[-1]) + 0.1).astype(np.float32)
    # >= 256 centers so the BLOCK weight ladder (the TPU production path,
    # not the element-fetch fallback) is what gets parity-tested
    centers = np.random.RandomState(9).randint(0, 300, 512)
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
    d_pos = np.asarray(res.positions)
    mism = np.argwhere((d_pos != h_pos) & h_mask)
    # near-total agreement, and every disagreement is a ULP-tie rank flip
    assert len(mism) <= 0.02 * h_mask.sum(), len(mism)
    for i, j in mism:
        c = centers[i]
        start, deg = row_ptr[c], row_ptr[c + 1] - row_ptr[c]
        offs = np.arange(deg, dtype=np.uint32)
        u = rng.rand_uniform_np(
            21, np.full(deg, c, np.uint32), np.uint32(_HOP_STRIDE) + offs
        )
        w = weights[start : start + deg].astype(np.float32)
        key = np.log(np.maximum(u, 1e-20)) / np.maximum(w, 1e-30)
        kd, kh = key[d_pos[i, j]], key[h_pos[i, j]]
        assert abs(kd - kh) <= 5e-4 * abs(kh), (i, j, kd, kh)


def test_host_dma_masked_gather_scatter():
    """Pinned-host pallas DMA path (device_cached_host cold fetch): masked
    gather from and scatter to a FLAT pltpu.MemorySpace.HOST memref via the
    4 KB page kernels (D=256 f32 -> 4 rows/page: exercises in-page select on
    gather and the dedup fetch-merge-write RMW on scatter)."""
    from jax.sharding import SingleDeviceSharding

    from wholegraph_tpu.ops.gather_pallas import host_gather_rows, host_scatter_rows

    dev = jax.devices()[0]
    N, D, B = 50_000, 256, 2048
    table = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    flat_h = jax.device_put(
        table.reshape(-1), SingleDeviceSharding(dev, memory_kind="pinned_host")
    )
    rs = np.random.RandomState(1)
    slots = rs.randint(0, N, B).astype(np.int32)
    slots[::3] = -1  # masked: skipped DMAs, garbage rows
    out = host_gather_rows(flat_h, jnp.asarray(slots), dim=D)
    valid = slots >= 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(table)[slots[valid]], rtol=1e-6
    )
    # scatter back: masked slots untouched; written slots unique (RMW contract)
    uniq = np.unique(slots[valid])[:512].astype(np.int32)
    wslots = np.full(1024, -1, np.int32)
    wslots[: len(uniq)] = uniq
    rows = jnp.ones((1024, D), jnp.float32) * 7.0
    new_h = host_scatter_rows(flat_h, jnp.asarray(wslots), rows, dim=D)
    got = np.asarray(jax.device_get(new_h)).reshape(N, D)
    np.testing.assert_allclose(got[uniq], 7.0)
    untouched = np.setdiff1d(np.arange(N), uniq)[:500]
    np.testing.assert_allclose(got[untouched], np.asarray(table)[untouched], rtol=1e-6)


def test_host_dma_whole_page_rows():
    """Host tier at D=1024 f32 (row == one 4 KB page): direct row DMAs, no
    RMW on scatter."""
    from jax.sharding import SingleDeviceSharding

    from wholegraph_tpu.ops.gather_pallas import host_gather_rows, host_scatter_rows

    dev = jax.devices()[0]
    N, D, B = 4_000, 1024, 1024
    table = jax.random.normal(jax.random.PRNGKey(3), (N, D), jnp.float32)
    flat_h = jax.device_put(
        table.reshape(-1), SingleDeviceSharding(dev, memory_kind="pinned_host")
    )
    rs = np.random.RandomState(4)
    slots = rs.randint(0, N, B).astype(np.int32)
    slots[::5] = -1
    out = host_gather_rows(flat_h, jnp.asarray(slots), dim=D)
    valid = slots >= 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(table)[slots[valid]], rtol=1e-6
    )
    uniq = np.unique(slots[valid])[:256].astype(np.int32)
    wslots = np.full(512, -1, np.int32)
    wslots[: len(uniq)] = uniq
    rows = jnp.full((512, D), 3.0, jnp.float32)
    new_h = host_scatter_rows(flat_h, jnp.asarray(wslots), rows, dim=D)
    got = np.asarray(jax.device_get(new_h)).reshape(N, D)
    np.testing.assert_allclose(got[uniq], 3.0)
    untouched = np.setdiff1d(np.arange(N), uniq)[:200]
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


def test_gather_rows_window_grouped_bitexact():
    """Grouped sub-tile window gather (one DMA, group one-hot matmuls over
    static sub-slices): bit-exact vs take for in-window rows, and misses
    (drifted ids) are exactly the rows window_coverage predicts."""
    from wholegraph_tpu.ops.gather_pallas import gather_rows_window, window_coverage

    N, D, B = 200_000, 256, 8192
    rng = np.random.RandomState(11)
    for dtype, density in ((jnp.float32, 0.93), (jnp.bfloat16, 1.0)):
        base = (
            np.asarray(jax.random.normal(jax.random.PRNGKey(8), (N, D))) * 50
        ).astype(np.float32)
        if dtype == jnp.float32:
            # the f32 select is a bitwise byte-plane copy — every pattern
            # must survive, including non-finite and denormal payloads
            base[::97, 0] = np.nan
            base[::101, 1] = np.inf
            base[::103, 2] = -0.0
            base[::107, 3] = np.float32(1e-42)
        table = jnp.asarray(base, dtype=dtype)
        span = int(B / density)
        ids = np.sort(5_000 + rng.choice(span, B, replace=False)).astype(np.int32)
        idsj = jnp.asarray(ids)
        tile, group, wsub = 128, 8, 224
        window = (group - 1) * tile + wsub
        out = gather_rows_window(table, idsj, tile=tile, window=window, group=group)
        ref = jnp.take(table, idsj, axis=0)
        outn, refn = np.asarray(out), np.asarray(ref)
        # covered mask mirrors the kernel: per step of tile*group ids,
        # sub-tile g selects from its dynamic slice [w0 + s_g, w0 + s_g +
        # wsub) where s_g = clip(align32(first_id_g - w0), 0, window - wsub)
        step = tile * group
        w0 = np.clip((ids.reshape(-1, step)[:, :1] // 32) * 32, 0,
                     (N - window) // 32 * 32)
        sub = ids.reshape(-1, group, tile)
        s_g = np.clip((sub[:, :, 0] - w0) // 32 * 32, 0, window - wsub)
        off = sub - (w0 + s_g)[:, :, None]
        covered = ((off >= 0) & (off < wsub)).reshape(-1)
        # bitwise comparison: NaN != NaN under array_equal, but the select
        # must preserve the exact bits
        np.testing.assert_array_equal(
            outn[covered].view(np.uint8), refn[covered].view(np.uint8)
        )
        assert (outn[~covered] == 0).all()
        cov, _ = window_coverage(idsj, N, tile=tile, window=window, group=group)
        np.testing.assert_allclose(float(cov), covered.mean(), atol=1e-6)
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


def test_host_embedding_train_step_tpu():
    """Full device_cached_host embedding on hardware: pinned-host table +
    HBM cache, gather serves hits from HBM and misses over the host link,
    apply_gradients updates host rows (page RMW) + cached lines coherently.
    Mirrors tests/test_host_embedding.py's CPU-mesh parity on the real
    pinned-host placement (reference: embedding.cpp:564-767)."""
    from wholegraph_tpu.embedding.host_embedding import HostEmbedding
    from wholegraph_tpu.embedding.optimizers import SGD
    from wholegraph_tpu.parallel import create_global_mesh

    mesh = create_global_mesh()
    n, dim = 3_000, 256
    emb = HostEmbedding.create(
        mesh, n, dim, optimizer=SGD(), cache_ratio=0.25
    )
    rs = np.random.RandomState(5)
    arr = rs.randn(n, dim).astype(np.float32)
    hot = np.arange(0, n, 3)  # every 3rd row cached
    state = emb.from_array(arr, hot_ids=hot)

    ids_np = rs.randint(0, n, 512).astype(np.int32)
    ids = jnp.asarray(ids_np)
    rows = emb.gather(state, ids)
    np.testing.assert_allclose(np.asarray(rows), arr[ids_np], rtol=1e-6)

    # one SGD step with known grads; replay in numpy
    uids_np = np.unique(ids_np)[:256]
    uids = jnp.asarray(
        np.concatenate([uids_np, np.full(256 - len(uids_np), n, np.int32)])
        if len(uids_np) < 256 else uids_np[:256]
    )
    grads = jnp.ones((256, dim), jnp.float32) * 0.5
    state = emb.apply_gradients(state, uids, grads, lr=0.1)
    expect = arr.copy()
    valid = np.asarray(uids) < n
    expect[np.asarray(uids)[valid]] -= 0.1 * 0.5
    np.testing.assert_allclose(emb.to_array(state), expect, rtol=1e-5)

    # gather again: cached rows must reflect the update (coherence)
    rows2 = emb.gather(state, ids)
    np.testing.assert_allclose(np.asarray(rows2), expect[ids_np], rtol=1e-5)


def test_native_layout_apply_ring_tpu():
    """Native-layout embedding on hardware: the optimizer row movement goes
    through the pallas ring (gather3 + masked scatter3, no table relayout)
    and must stay bit-equal to the flat XLA take/.at[].set twin."""
    from wholegraph_tpu.embedding import Embedding, LazyAdam
    from wholegraph_tpu.parallel import create_global_mesh

    mesh = create_global_mesh()
    n, dim, B = 20_000, 256, 4096  # B >= 1024 -> ring path
    rng = np.random.RandomState(3)
    init = rng.randn(n, dim).astype(np.float32)
    embs, states = {}, {}
    for native in (False, True):
        e = Embedding.create(mesh, n, dim, optimizer=LazyAdam(), native_layout=native)
        embs[native], states[native] = e, e.from_array(init)
    assert states[True].table.ndim == 3

    for step in range(2):
        ids = rng.randint(0, n, B).astype(np.int32)
        mask = rng.rand(B) > 0.05
        grads = rng.randn(B, dim).astype(np.float32)
        outs = {}
        for native in (False, True):
            e, st = embs[native], states[native]
            outs[native] = np.asarray(e.gather(st, jnp.asarray(ids)))
            states[native] = e.apply_gradients(
                st, jnp.asarray(ids), jnp.asarray(grads), 0.05,
                mask=jnp.asarray(mask),
            )
        np.testing.assert_array_equal(outs[False], outs[True])
    np.testing.assert_array_equal(
        embs[False].to_array(states[False]), embs[True].to_array(states[True])
    )
    for k in ("m", "v"):
        np.testing.assert_array_equal(
            embs[False].slot_to_array(states[False], k),
            embs[True].slot_to_array(states[True], k),
        )


@pytest.mark.parametrize("dim,ksub", [(768, 2), (1024, 2), (1536, 3)])
def test_wide_row_split_gather_exact(dim, ksub):
    """The opt-in sub-slab split (split=k) must be byte-identical to the
    default whole-slab kernel and to numpy (the split lost the perf A/B —
    DESIGN.md — but stays exact behind the explicit parameter)."""
    from wholegraph_tpu.ops.gather_pallas import _gather_rows_pallas3_impl

    N, B = 20_000, 4096
    rs = np.random.RandomState(7)
    table = jnp.asarray(rs.randn(N, dim).astype(np.float32))
    ids_np = rs.randint(0, N, B).astype(np.int32)
    ids = jnp.asarray(ids_np)
    out_split = np.asarray(
        _gather_rows_pallas3_impl(table, ids, split=ksub)
    ).reshape(B, dim)
    np.testing.assert_array_equal(out_split, np.asarray(table)[ids_np])
    out_whole = np.asarray(
        _gather_rows_pallas3_impl(table, ids)  # default: whole rows
    ).reshape(B, dim)
    np.testing.assert_array_equal(out_split, out_whole)


def test_wide_row_split_scatter_exact():
    from wholegraph_tpu.ops.gather_pallas import (
        scatter_rows_masked3,
        scatter_rows_pallas3,
    )

    N, dim, B = 20_000, 1024, 2048
    P = dim // 128
    rs = np.random.RandomState(8)
    base = rs.randn(N, dim).astype(np.float32)
    ids_np = rs.choice(N, B, replace=False).astype(np.int32)
    rows_np = rs.randn(B, dim).astype(np.float32)
    out = np.asarray(
        scatter_rows_pallas3(
            jnp.asarray(base).reshape(N, P, 128),
            jnp.asarray(ids_np),
            jnp.asarray(rows_np).reshape(B, P, 128),
            split=2,  # opt-in sub-slab path (default is whole rows)
        )
    ).reshape(N, dim)
    expect = base.copy()
    expect[ids_np] = rows_np
    np.testing.assert_array_equal(out, expect)

    # masked: negative slots skipped
    slots = ids_np.copy()
    slots[::3] = -1
    out2 = np.asarray(
        scatter_rows_masked3(
            jnp.asarray(base).reshape(N, P, 128),
            jnp.asarray(slots),
            jnp.asarray(rows_np).reshape(B, P, 128),
        )
    ).reshape(N, dim)
    expect2 = base.copy()
    keep = slots >= 0
    expect2[slots[keep]] = rows_np[keep]
    np.testing.assert_array_equal(out2, expect2)


def test_host_gather_spans_exact_clustered_and_scattered():
    """Span-coalesced host gather: bit-exact on clustered batches and on
    scattered batches (overflow -> per-row fallback inside lax.cond)."""
    from wholegraph_tpu.ops.gather_pallas import (
        host_gather_rows,
        host_gather_rows_spans,
    )

    N, dim, B = 500_000, 256, 8192
    rs = np.random.RandomState(11)
    table_np = rs.randn(N, dim).astype(np.float32)
    flat = jax.device_put(
        table_np.reshape(-1),
        jax.sharding.SingleDeviceSharding(
            jax.devices()[0], memory_kind="pinned_host"
        ),
    )
    # clustered: dense window
    base = 123_456
    slots_np = (base + np.sort(rs.choice(12_000, B, replace=False))).astype(
        np.int32
    )
    rs.shuffle(slots_np)
    out = np.asarray(
        host_gather_rows_spans(flat, jnp.asarray(slots_np), dim=dim)
    )
    np.testing.assert_array_equal(out, table_np[slots_np])
    # scattered: falls back, still exact
    slots2 = rs.choice(N, B, replace=False).astype(np.int32)
    out2 = np.asarray(
        host_gather_rows_spans(flat, jnp.asarray(slots2), dim=dim)
    )
    np.testing.assert_array_equal(out2, table_np[slots2])
    # agreement with the per-row ring on the same batch
    out3 = np.asarray(host_gather_rows(flat, jnp.asarray(slots_np), dim=dim))
    np.testing.assert_array_equal(out, out3)


def test_select_lanes_pallas_tpu():
    """Fused lane select: out[b, k] = lanes[b, loc[b, k]], 0 outside
    [0, S) — vs a numpy replica, with non-tile-multiple B (padding path)
    and out-of-range locs."""
    from wholegraph_tpu.ops.gather_pallas import select_lanes_pallas

    rs = np.random.RandomState(3)
    B, S, K = 1000, 256, 15
    lanes = rs.randint(-(2**31), 2**31, (B, S)).astype(np.int32)
    loc = rs.randint(-5, S + 5, (B, K)).astype(np.int32)
    out = np.asarray(select_lanes_pallas(jnp.asarray(lanes), jnp.asarray(loc), K))
    exp = np.where(
        (loc >= 0) & (loc < S),
        np.take_along_axis(lanes, np.clip(loc, 0, S - 1), axis=1),
        0,
    )
    np.testing.assert_array_equal(out, exp)


def test_gather_lane_slabs_pallas_tpu():
    """One-descriptor slab fetch: out[i] = c2[blk[i]:blk[i]+nb] flattened,
    vs numpy, with non-1024-multiple B (padding path)."""
    from wholegraph_tpu.ops.gather_pallas import gather_lane_slabs_pallas

    rs = np.random.RandomState(4)
    nblk, nb, B = 4096, 2, 3000
    c2 = rs.randint(-(2**31), 2**31, (nblk, 128)).astype(np.int32)
    blk = rs.randint(0, nblk - nb + 1, B).astype(np.int32)
    out = np.asarray(gather_lane_slabs_pallas(jnp.asarray(c2), jnp.asarray(blk), nb))
    exp = np.stack([c2[b : b + nb].reshape(-1) for b in blk])
    np.testing.assert_array_equal(out, exp)


def test_col_fetch_slab_select_bitequal_element_path_tpu():
    """Honest unaligned mixed-degree CSR through the r5 slab-DMA +
    pallas-select col fetch (the nb-block switch) vs the per-element
    path — bit-equal end to end, including near-table-end clamped
    windows."""
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    rs = np.random.RandomState(5)
    n, K = 20_000, 10
    degs = rs.randint(3, 28, n)
    rp = np.concatenate([[0], np.cumsum(degs)]).astype(np.int32)
    E = int(rp[-1])
    col = rs.randint(0, n, E).astype(np.int32)
    # include centers at the very end of the table (slab clamp path)
    centers = np.concatenate(
        [rs.randint(0, n, 2048 - 16), np.arange(n - 16, n)]
    ).astype(np.int32)
    args = (jnp.asarray(rp), jnp.asarray(col), jnp.asarray(centers), K)
    res_e = csr_sample_neighbors(*args, seed=9)  # element path
    res_b = csr_sample_neighbors(*args, seed=9, max_degree=65536)
    np.testing.assert_array_equal(np.asarray(res_e.mask), np.asarray(res_b.mask))
    np.testing.assert_array_equal(
        np.asarray(res_e.neighbors), np.asarray(res_b.neighbors)
    )


def test_col_one_block_path_matches_element_path_tpu():
    """Aligned constant-degree CSR (start = 16*c => s_lane + deg <= 128
    batch-wide) engages the sort-free 1-block col fetch: results must be
    bit-identical to the per-element path (positions are max_degree-
    independent, so the two calls differ only in the col kernel)."""
    from wholegraph_tpu.ops.sampling import csr_sample_neighbors

    n, d, K = 4000, 16, 8
    row_ptr = np.arange(n + 1, dtype=np.int32) * d
    col = np.random.RandomState(21).randint(0, n, n * d).astype(np.int32)
    centers = np.random.RandomState(22).randint(0, n, 1024).astype(np.int32)
    args = (jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(centers), K)
    res_e = csr_sample_neighbors(*args, seed=4)  # no max_degree -> element
    res_b = csr_sample_neighbors(*args, seed=4, max_degree=4096)  # 1-block
    np.testing.assert_array_equal(np.asarray(res_e.mask), np.asarray(res_b.mask))
    np.testing.assert_array_equal(
        np.asarray(res_e.positions), np.asarray(res_b.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(res_e.neighbors), np.asarray(res_b.neighbors)
    )


def test_spmm_window_matches_segment_sum_tpu():
    """Fused pallas windowed SpMM (round 4): per-dest-tile window DMA +
    in-VMEM int8 one-hot A-build + A @ window, vs the segment-sum spmm."""
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, spmm
    from wholegraph_tpu.ops.spmm_pallas import spmm_window

    rs = np.random.RandomState(0)
    n, deg, dim, width = 20_000, 12, 256, 160
    counts = rs.randint(4, deg, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    x = rs.randn(n, dim).astype(np.float32)
    w = rs.rand(E).astype(np.float32)
    window, edge_cap, feasible = plan_spmm_tiles(rp, col, tile=256)
    assert feasible
    edge_dst = np.repeat(np.arange(n), counts).astype(np.int32)
    for reduce, ew in (("sum", None), ("mean", None), ("sum", w)):
        ref = np.asarray(
            spmm(jnp.asarray(col), jnp.asarray(edge_dst), jnp.asarray(x), n,
                 reduce, edge_weight=None if ew is None else jnp.asarray(ew))
        )
        got = np.asarray(
            spmm_window(jnp.asarray(rp), jnp.asarray(col), jnp.asarray(x),
                        window=window, edge_cap=edge_cap, tile=256,
                        reduce=reduce,
                        edge_weight=None if ew is None else jnp.asarray(ew))
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_weighted_fused_pair_blocks_bitequal_tpu():
    """Fused pair-block weighted sampling (round 4: one DMA serves A-Res
    keys AND neighbor values via interleave_col_weights) must be
    bit-identical to the unfused weighted path ON SILICON, across the
    single-shot and ladder regimes."""
    from wholegraph_tpu.ops.sampling import (
        csr_sample_neighbors,
        interleave_col_weights,
    )

    rs = np.random.RandomState(7)
    for tag, lo, hi, nheavy in [("2blk", 16, 49, 0), ("ladder", 16, 49, 12)]:
        n, K, B = 50_000, 10, 8192
        deg_np = rs.randint(lo, hi, n).astype(np.int32)
        if nheavy:
            deg_np[rs.choice(n, nheavy, replace=False)] = rs.randint(
                600, 1500, nheavy
            )
        rp_np = np.concatenate([[0], np.cumsum(deg_np)]).astype(np.int32)
        E = int(rp_np[-1])
        col = jnp.asarray(rs.randint(0, n, E).astype(np.int32))
        weights = jnp.asarray(rs.rand(E).astype(np.float32) + 0.05)
        centers = jnp.asarray(rs.randint(0, n, B).astype(np.int32))
        rp = jnp.asarray(rp_np)
        ref = csr_sample_neighbors(
            rp, col, centers, K, seed=3, hop=1, weights=weights,
            max_degree=4096,
        )
        cw = jax.jit(interleave_col_weights)(col, weights)
        got = csr_sample_neighbors(
            rp, col, centers, K, seed=3, hop=1, weights=weights,
            max_degree=4096, cw_blocks=cw,
        )
        for field in ("neighbors", "mask", "positions", "edge_ids"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, field)),
                np.asarray(getattr(ref, field)),
                err_msg=f"{tag}:{field}",
            )


def test_gather_rows_window_splits_bitexact_tpu():
    """splits=4 (r4 opt-in sub-slab DMA mode) must be bit-identical to
    the single-slab DMA (splits=1, the default) on sorted batches."""
    from wholegraph_tpu.ops.gather_pallas import gather_rows_window

    rs = np.random.RandomState(3)
    N, D, B = 300_000, 256, 1 << 16
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (N, D), jnp.float32)
    )()
    span = int(B / 0.8)
    ids = jnp.asarray(
        np.sort(rs.choice(span, B, replace=False) + 1000).astype(np.int32)
    )
    kw = dict(tile=128, group=8, window=1408, wsub=224)
    a = gather_rows_window(table, ids, splits=1, **kw)
    b = gather_rows_window(table, ids, splits=4, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_gather_window_exact_tpu():
    """Window-mode host gather (round 4: chunked big-DMA fetch + device
    take) — bit-exact on dense clustered batches (window engages), sparse
    batches (density gate -> spans), and scattered batches (size gate ->
    spans -> per-row ring), incl. masked slots and an end-of-table window."""
    from wholegraph_tpu.ops.gather_pallas import (
        host_gather_rows_window,
    )

    N, dim = 2_000_000, 256
    rs = np.random.RandomState(13)
    table_np = (np.arange(N, dtype=np.float32)[:, None]
                + np.arange(dim, dtype=np.float32) / 1000.0)
    flat = jax.device_put(
        table_np.reshape(-1),
        jax.sharding.SingleDeviceSharding(
            jax.devices()[0], memory_kind="pinned_host"
        ),
    )

    def run(slots_np):
        out = np.asarray(
            host_gather_rows_window(flat, jnp.asarray(slots_np), dim=dim)
        )
        keep = slots_np >= 0
        np.testing.assert_array_equal(out[keep], table_np[slots_np[keep]])

    B = 50_000
    # dense clustered (density 0.8): the window branch
    s = (700_000 + np.sort(rs.choice(int(B / 0.8), B, replace=False))).astype(np.int32)
    s[::9] = -1
    run(s)
    # end-of-table window (lo clamp path)
    run(np.arange(N - 40_000, N).astype(np.int32))
    # sparse in a wide span (density gate -> spans branch)
    run((500_000 + rs.choice(400_000, 8192, replace=False)).astype(np.int32))
    # fully scattered (size gate -> spans -> ring)
    run(rs.choice(N, 8192, replace=False).astype(np.int32))


def test_apply_dump_scatter_bitequal_tpu():
    """The r4 apply ring (UNCONDITIONAL scatters + row-0 dump & post-fix —
    masked per-DMA guards measured 2.7x slower, exp_apply_scatter.py) must
    be BIT-equal to the XLA take/.at[].set path, specifically including
    local row 0's table AND optimizer slots when row 0 is (a) genuinely
    updated, (b) only dump-written by masked padding."""
    from unittest import mock

    from wholegraph_tpu.embedding import Embedding, create_optimizer
    from wholegraph_tpu.parallel import create_global_mesh

    mesh = create_global_mesh()
    n, dim, B = 40_000, 256, 4096
    rs = np.random.RandomState(17)
    emb = Embedding.create(mesh, n, dim,
                           optimizer=create_optimizer("lazy_adam"))
    table_np = rs.randn(n, dim).astype(np.float32)
    # apply_gradients donates the state buffers — rebuild per run
    make_state = lambda: emb.from_array(table_np)

    for tag, touch0 in (("row0-touched", True), ("row0-padding-only", False)):
        ids_np = rs.randint(1, n, B).astype(np.int32)
        mask_np = np.ones(B, bool)
        mask_np[::11] = False  # masked padding -> dump writes to row 0
        if touch0:
            ids_np[5] = 0  # logical id 0 == local slot 0 on shard 0
            mask_np[5] = True
        ids = jnp.asarray(ids_np)
        mask = jnp.asarray(mask_np)
        grads = jnp.asarray(rs.randn(B, dim).astype(np.float32))

        from wholegraph_tpu.embedding.embedding import _build_apply_fn

        ring = emb.apply_gradients(make_state(), ids, grads, 1e-2, mask=mask)
        _build_apply_fn.cache_clear()  # the backend gate is trace-time
        with mock.patch("jax.default_backend", return_value="cpu"):
            # forces _optimizer_step's XLA take/.at[].set fallback; all ops
            # inside still execute on the TPU
            ref = emb.apply_gradients(make_state(), ids, grads, 1e-2, mask=mask)
        _build_apply_fn.cache_clear()

        np.testing.assert_array_equal(
            np.asarray(emb.table_2d(ring)), np.asarray(emb.table_2d(ref)),
            err_msg=f"{tag}: table",
        )
        for s in ring.slots:
            np.testing.assert_array_equal(
                np.asarray(ring.slots[s]).reshape(-1, dim),
                np.asarray(ref.slots[s]).reshape(-1, dim),
                err_msg=f"{tag}: slot {s}",
            )


def test_sddmm_window_matches_xla_tpu():
    """Windowed SDDMM on silicon vs the XLA per-edge sddmm (covers the S
    matmul precision, the one-hot extraction, and the block flattening)."""
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, sddmm
    from wholegraph_tpu.ops.spmm_pallas import sddmm_window

    rs = np.random.RandomState(21)
    n, dim, width = 20_000, 256, 160
    counts = rs.randint(0, 12, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    a = rs.randn(n, dim).astype(np.float32)
    b = rs.randn(n, dim).astype(np.float32)
    window, edge_cap, feasible = plan_spmm_tiles(rp, col, tile=256)
    assert feasible
    dst = np.repeat(np.arange(n), counts).astype(np.int32)
    ref = np.asarray(sddmm(jnp.asarray(col), jnp.asarray(dst),
                           jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(sddmm_window(jnp.asarray(rp), jnp.asarray(col),
                                  jnp.asarray(a), jnp.asarray(b),
                                  window=window, edge_cap=edge_cap))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_bf16_native_apply_ring_bitequal_tpu():
    """bf16 tables through the pallas rings on hardware (r5): native-layout
    bf16 gather3/scatter3 apply must be bit-equal to the flat XLA twin
    (bf16 HBM tiling is (16, 128) — the [N, D//128, 128] bf16 view rides
    partial tiles, so silicon coverage is mandatory)."""
    from wholegraph_tpu.embedding import Embedding, LazyAdam
    from wholegraph_tpu.parallel import create_global_mesh

    mesh = create_global_mesh()
    n, dim, B = 20_000, 256, 4096
    rng = np.random.RandomState(23)
    init = rng.randn(n, dim).astype(np.float32)
    embs, states = {}, {}
    for native in (False, True):
        e = Embedding.create(mesh, n, dim, dtype=jnp.bfloat16,
                             optimizer=LazyAdam(), native_layout=native)
        embs[native], states[native] = e, e.from_array(init)
    assert states[True].table.ndim == 3

    for step in range(2):
        ids = rng.randint(0, n, B).astype(np.int32)
        mask = rng.rand(B) > 0.05
        grads = rng.randn(B, dim).astype(np.float32)
        outs = {}
        for native in (False, True):
            e, st = embs[native], states[native]
            outs[native] = np.asarray(e.gather(st, jnp.asarray(ids)))
            states[native] = e.apply_gradients(
                st, jnp.asarray(ids), jnp.asarray(grads), 0.05,
                mask=jnp.asarray(mask),
            )
        np.testing.assert_array_equal(
            outs[False].view(np.uint16), outs[True].view(np.uint16)
        )
    np.testing.assert_array_equal(
        np.asarray(embs[False].to_array(states[False])).view(np.uint16),
        np.asarray(embs[True].to_array(states[True])).view(np.uint16),
    )
    for k in ("m", "v"):
        np.testing.assert_array_equal(
            embs[False].slot_to_array(states[False], k),
            embs[True].slot_to_array(states[True], k),
        )


def test_apply_assume_unique_chunk_bitequal_tpu():
    """assume_unique + unique_chunk (r5 touched-rows-proportional apply)
    through the hardware ring path: state bit-equal to the default
    dedup-sort single-shot apply on a sampler-shaped unique prefix."""
    from wholegraph_tpu.embedding import Embedding, create_optimizer
    from wholegraph_tpu.parallel import create_global_mesh

    mesh = create_global_mesh()
    n, dim, B = 40_000, 256, 8192
    rs = np.random.RandomState(29)
    table_np = rs.randn(n, dim).astype(np.float32)
    n_valid = 3000  # valid unique prefix, padded suffix
    perm = rs.permutation(n)[:n_valid].astype(np.int32)
    ids_np = np.zeros(B, np.int32)
    ids_np[:n_valid] = perm
    mask_np = np.zeros(B, bool)
    mask_np[:n_valid] = True
    grads = jnp.asarray(rs.randn(B, dim).astype(np.float32))
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    emb = Embedding.create(mesh, n, dim, optimizer=create_optimizer("lazy_adam"))
    ref = emb.apply_gradients(emb.from_array(table_np), ids, grads, 1e-2,
                              mask=mask)
    fast = emb.apply_gradients(emb.from_array(table_np), ids, grads, 1e-2,
                               mask=mask, assume_unique=True,
                               unique_chunk=1024)
    np.testing.assert_array_equal(
        np.asarray(emb.table_2d(ref)), np.asarray(emb.table_2d(fast))
    )
    for s in ref.slots:
        np.testing.assert_array_equal(
            np.asarray(ref.slots[s]).reshape(-1, dim),
            np.asarray(fast.slots[s]).reshape(-1, dim),
        )


def test_gat_windowed_matches_xla_tpu():
    """Fused GAT full-graph path on silicon (r5): forward + grads vs the
    per-edge XLA path — covers the weighted spmm_window fwd, the dw
    windowed-SDDMM VJP, and the analytic self-loop softmax."""
    from wholegraph_tpu.graph import GraphStructure
    from wholegraph_tpu.models.conv import GATConv

    rs = np.random.RandomState(31)
    n = 20_000
    counts = rs.randint(0, 10, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts) + rs.randint(-80, 81, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(rp), col=jnp.asarray(col), node_count=n,
        edge_count=E, max_degree=int(counts.max()),
    )
    fg_plain = g.to_full_graph()
    fg_win = g.to_full_graph(windowed=True)
    assert fg_win.row_ptr is not None
    feats = jnp.asarray(rs.randn(n, 64).astype(np.float32))
    layer = GATConv(out_dim=64, num_heads=4)
    params = layer.init(jax.random.PRNGKey(2), feats, fg_plain)

    out_p = np.asarray(layer.apply(params, feats, fg_plain))
    out_w = np.asarray(layer.apply(params, feats, fg_win))
    np.testing.assert_allclose(out_w, out_p, rtol=1e-3, atol=1e-3)

    def loss(p, x, fg):
        return jnp.sum(jnp.tanh(layer.apply(p, x, fg))) / E

    gp_p, gx_p = jax.grad(loss, argnums=(0, 1))(params, feats, fg_plain)
    gp_w, gx_w = jax.grad(loss, argnums=(0, 1))(params, feats, fg_win)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3),
        gp_p, gp_w,
    )
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_p),
                               rtol=2e-3, atol=2e-3)
    assert float(jnp.abs(gp_w["params"]["attn_src"]).max()) > 0

"""GraphStructure multilayer sampling tests (reference:
torch/graph_structure.py:140-196 composition; parity with per-hop host
sampler + structural invariants)."""

import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.graph import GraphStructure

import host_sampler as hs


def build_graph(n=300, avg_deg=8, seed=0):
    row_ptr, col = hs.random_csr(n, avg_deg, seed=seed)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
    )
    return g, row_ptr, col


def test_from_coo():
    src = np.array([0, 0, 1, 2, 2, 2])
    dst = np.array([1, 2, 0, 0, 1, 3])
    g = GraphStructure.from_coo(src, dst, 4)
    np.testing.assert_array_equal(np.asarray(g.row_ptr), [0, 2, 3, 6, 6])
    np.testing.assert_array_equal(np.asarray(g.col), [1, 2, 0, 0, 1, 3])
    assert g.max_degree == 3 and g.edge_count == 6


def test_multilayer_invariants():
    g, row_ptr, col = build_graph()
    centers = np.random.RandomState(1).choice(300, 32, replace=False)
    fanouts = (4, 3)
    ml = g.multilayer_sample(jnp.asarray(centers), fanouts, seed=7)

    assert len(ml.hops) == 2
    lg = [np.asarray(x) for x in ml.level_gids]
    lm = [np.asarray(x) for x in ml.level_masks]

    # level sizes: 32 -> 32*(4+1)=160 -> 160*(3+1)=640
    assert lg[0].shape == (32,) and lg[1].shape == (160,) and lg[2].shape == (640,)
    np.testing.assert_array_equal(lg[0], centers)

    # nesting: level l gids are the prefix of level l+1 gids (on valid slots)
    for l in range(2):
        U = len(lg[l])
        np.testing.assert_array_equal(lm[l + 1][:U], lm[l])
        np.testing.assert_array_equal(lg[l + 1][:U] * lm[l], lg[l] * lm[l])

    # each level's valid gids are unique
    for l in range(3):
        v = lg[l][lm[l]]
        assert len(np.unique(v)) == len(v)

    # edges are real + match the host sampler's neighbor multiset per center
    for l, K in enumerate(fanouts):
        hop = ml.hops[l]
        nbr_idx = np.asarray(hop.nbr_idx)
        mask = np.asarray(hop.mask)
        cm = np.asarray(hop.center_mask)
        nxt = lg[l + 1]
        for i in range(hop.num_targets):
            if not cm[i]:
                assert not mask[i].any()
                continue
            c = lg[l][i]
            got = sorted(nxt[nbr_idx[i][mask[i]]])
            h_nbrs, h_mask, _ = hs.sample_uniform_host(
                row_ptr, col, [c], K, seed=7, hop=l
            )
            expect = sorted(h_nbrs[0][h_mask[0]])
            assert got == expect, (l, i, c, got, expect)

    # final unique set == union of all valid gids at the deepest level
    np.testing.assert_array_equal(np.asarray(ml.unique_gids), lg[2])


def test_multilayer_deterministic():
    g, _, _ = build_graph(seed=3)
    centers = jnp.asarray(np.arange(16))
    a = g.multilayer_sample(centers, (3, 2), seed=42)
    b = g.multilayer_sample(centers, (3, 2), seed=42)
    np.testing.assert_array_equal(np.asarray(a.unique_gids), np.asarray(b.unique_gids))
    c = g.multilayer_sample(centers, (3, 2), seed=43)
    assert not np.array_equal(np.asarray(a.unique_gids), np.asarray(c.unique_gids))


def test_multilayer_weighted():
    """Weighted multilayer sampling: runs, respects masks, biases to heavy
    edges (A-Res through the multilayer path)."""
    import jax.numpy as jnp
    from wholegraph_tpu.graph import GraphStructure

    n = 60
    row_ptr = np.arange(n + 1, dtype=np.int64) * 10
    col = np.random.RandomState(0).randint(0, n, n * 10).astype(np.int32)
    w = np.full(n * 10, 0.01, np.float32)
    w[::10] = 50.0  # first neighbor of each node is heavy
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=n * 10,
        max_degree=10,
        edge_weight=jnp.asarray(w),
    )
    centers = jnp.asarray(np.arange(16))
    hits = 0
    for seed in range(20):
        ml = g.multilayer_sample(centers, (2,), seed=seed, weighted=True)
        hop = ml.hops[0]
        pos0 = np.asarray(
            g.sample_one_hop(centers, 2, seed=seed, weighted=True).positions
        )
        hits += (pos0[np.asarray(hop.mask)] == 0).sum()
    total = 20 * 16 * 2
    assert hits > total * 0.4, f"heavy edge sampled only {hits}/{total}"

"""Conv layer + model tests: numpy references for the padded convs, gradient
flow, and end-to-end sampled training descent (reference: the model layer is
exercised through examples; we test convs directly like cugraph-ops does)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.graph.structure import HopSubgraph
from wholegraph_tpu.models import (
    FullGraph,
    GATConv,
    GCNConv,
    HomoGNN,
    RGCNConv,
    SAGEConv,
    cross_entropy_loss,
)
from wholegraph_tpu.ops import spmm as S

import host_sampler as hs


def make_hop(B, K, U, seed=0):
    rs = np.random.RandomState(seed)
    nbr = rs.randint(0, U, (B, K)).astype(np.int32)
    mask = rs.rand(B, K) > 0.3
    return HopSubgraph(
        nbr_idx=jnp.asarray(np.where(mask, nbr, 0)),
        mask=jnp.asarray(mask),
        center_mask=jnp.ones((B,), bool),
    )


def test_padded_reduce_matches_numpy():
    B, K, U, D = 8, 5, 32, 16
    hop = make_hop(B, K, U)
    x = np.random.RandomState(1).randn(U, D).astype(np.float32)
    nbr = np.asarray(hop.nbr_idx)
    mask = np.asarray(hop.mask)
    for red in ["sum", "mean", "max"]:
        out = np.asarray(S.padded_reduce(jnp.asarray(x), hop.nbr_idx, hop.mask, red))
        for i in range(B):
            sel = x[nbr[i][mask[i]]]
            if len(sel) == 0:
                expect = np.zeros(D)
            elif red == "sum":
                expect = sel.sum(0)
            elif red == "mean":
                expect = sel.mean(0)
            else:
                expect = sel.max(0)
            np.testing.assert_allclose(out[i], expect, rtol=1e-5, atol=1e-6, err_msg=red)


def test_spmm_sddmm_matches_numpy():
    E, N, D = 64, 16, 8
    rs = np.random.RandomState(2)
    dst = np.sort(rs.randint(0, N, E)).astype(np.int32)
    src = rs.randint(0, N, E).astype(np.int32)
    x = rs.randn(N, D).astype(np.float32)
    out = np.asarray(S.spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), N, "sum"))
    expect = np.zeros((N, D), np.float32)
    np.add.at(expect, dst, x[src])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)

    e = np.asarray(S.sddmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(e, (x[dst] * x[src]).sum(-1), rtol=1e-5, atol=1e-5)


def test_sage_conv_manual():
    """SAGEConv output == W·[x_self, mean(x_neigh)] + b by construction."""
    B, K, U, D = 4, 3, 10, 6
    hop = make_hop(B, K, U, seed=3)
    x = np.random.RandomState(4).randn(U, D).astype(np.float32)
    conv = SAGEConv(out_dim=5)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), hop)
    out = conv.apply(params, jnp.asarray(x), hop)
    Wk = np.asarray(params["params"]["proj"]["kernel"])
    bk = np.asarray(params["params"]["proj"]["bias"])
    neigh = np.asarray(S.padded_reduce(jnp.asarray(x), hop.nbr_idx, hop.mask, "mean"))
    expect = np.concatenate([x[:B], neigh], -1) @ Wk + bk
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("conv_cls", [SAGEConv, GCNConv])
def test_conv_full_graph_mode(conv_cls):
    N, D = 12, 8
    rs = np.random.RandomState(5)
    dst = np.sort(rs.randint(0, N, 40)).astype(np.int32)
    src = rs.randint(0, N, 40).astype(np.int32)
    g = FullGraph(jnp.asarray(src), jnp.asarray(dst), N)
    x = jnp.asarray(rs.randn(N, D).astype(np.float32))
    conv = conv_cls(out_dim=4)
    params = conv.init(jax.random.PRNGKey(0), x, g)
    out = conv.apply(params, x, g)
    assert out.shape == (N, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_gat_conv_padded_attention_normalised():
    B, K, U, D = 4, 3, 10, 6
    hop = make_hop(B, K, U, seed=6)
    x = jnp.asarray(np.random.RandomState(7).randn(U, D).astype(np.float32))
    conv = GATConv(out_dim=4, num_heads=2)
    params = conv.init(jax.random.PRNGKey(0), x, hop)
    out = conv.apply(params, x, hop)
    assert out.shape == (B, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_rgcn_conv_padded():
    B, K, U, D, R = 4, 3, 10, 6, 3
    hop = make_hop(B, K, U, seed=8)
    et = jnp.asarray(np.random.RandomState(9).randint(0, R, (B, K)))
    x = jnp.asarray(np.random.RandomState(10).randn(U, D).astype(np.float32))
    conv = RGCNConv(out_dim=4, num_relations=R)
    params = conv.init(jax.random.PRNGKey(0), x, hop, et)
    out = conv.apply(params, x, hop, et)
    assert out.shape == (B, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("model_type", ["sage", "gcn", "gat"])
def test_homo_gnn_sampled_training_descends(model_type):
    n, D, C, B = 200, 16, 5, 16
    row_ptr, col = hs.random_csr(n, avg_deg=6, seed=11)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
    )
    rs = np.random.RandomState(12)
    feats = rs.randn(n, D).astype(np.float32)
    labels = rs.randint(0, C, n)

    model = HomoGNN(model_type=model_type, hidden_dim=16, num_classes=C, num_layers=2)
    centers = np.arange(B)
    ml = g.multilayer_sample(jnp.asarray(centers), (4, 3), seed=0)
    x = jnp.asarray(feats)[ml.unique_gids] * ml.unique_mask[:, None]
    params = model.init(jax.random.PRNGKey(0), x, sample=ml)
    y = jnp.asarray(labels[centers])

    @jax.jit
    def step(params, ml, x, y):
        def loss_fn(p):
            logits = model.apply(p, x, sample=ml)
            return cross_entropy_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree.map(lambda p, g_: p - 0.05 * g_, params, grads), loss

    losses = []
    for it in range(30):
        ml = g.multilayer_sample(jnp.asarray(centers), (4, 3), seed=it)
        x = jnp.asarray(feats)[ml.unique_gids] * ml.unique_mask[:, None]
        params, loss = step(params, ml, x, y)
        losses.append(float(loss))
    # smoke test: loss must clearly descend and stay finite
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_rgcn_sampled_end_to_end():
    """RGCN over a sampled multilayer batch with edge types carried through
    the hops (GraphStructure.edge_type -> HopSubgraph.edge_type)."""
    from wholegraph_tpu.graph.structure import GraphStructure as GS

    n, D, C, R, B = 150, 8, 4, 3, 8
    rs = np.random.RandomState(20)
    src = rs.randint(0, n, n * 5)
    dst = rs.randint(0, n, n * 5)
    et = rs.randint(0, R, n * 5)
    g = GS.from_coo(src, dst, n, edge_type=et, num_relations=R)
    assert g.num_relations == R
    feats = rs.randn(n, D).astype(np.float32)
    labels = rs.randint(0, C, n)

    model = HomoGNN(
        model_type="rgcn", hidden_dim=16, num_classes=C, num_layers=2,
        num_relations=R,
    )
    centers = np.arange(B)
    ml = g.multilayer_sample(jnp.asarray(centers), (4, 3), seed=0)
    assert ml.hops[0].edge_type is not None
    x = jnp.asarray(feats)[ml.unique_gids] * ml.unique_mask[:, None]
    params = model.init(jax.random.PRNGKey(0), x, sample=ml)
    logits = model.apply(params, x, sample=ml)
    assert logits.shape == (B, C)
    assert np.isfinite(np.asarray(logits)).all()

    # edge types must match the underlying graph for each sampled edge
    et_dev = np.asarray(ml.hops[0].edge_type)
    mask = np.asarray(ml.hops[0].mask)
    lg1 = np.asarray(ml.level_gids[1])
    row_ptr = np.asarray(g.row_ptr)
    col = np.asarray(g.col)
    etype_arr = np.asarray(g.edge_type)
    eids = np.asarray(ml.hops[0].edge_ids) if hasattr(ml.hops[0], "edge_ids") else None
    nbr_idx = np.asarray(ml.hops[0].nbr_idx)
    for i in range(B):
        for k in range(4):
            if mask[i, k]:
                nbr_gid = lg1[nbr_idx[i, k]]
                c = centers[i]
                # the sampled edge (c -> nbr_gid) with this type must exist
                seg = slice(row_ptr[c], row_ptr[c + 1])
                assert any(
                    (col[seg][j] == nbr_gid) and (etype_arr[seg][j] == et_dev[i, k])
                    for j in range(row_ptr[c + 1] - row_ptr[c])
                )


def test_sampled_train_full_graph_eval():
    """Params trained with sampling evaluate exactly on the full graph
    (GraphStructure.to_full_graph + the same conv modules)."""
    n, D, C, B = 150, 16, 4, 16
    row_ptr, col = hs.random_csr(n, avg_deg=8, seed=30)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
    )
    rs = np.random.RandomState(31)
    feats = jnp.asarray(rs.randn(n, D).astype(np.float32))
    model = HomoGNN(model_type="sage", hidden_dim=16, num_classes=C, num_layers=2)
    ml = g.multilayer_sample(jnp.asarray(np.arange(B)), (4, 3), seed=0)
    x = feats[ml.unique_gids] * ml.unique_mask[:, None]
    params = model.init(jax.random.PRNGKey(0), x, sample=ml)

    fg = g.to_full_graph()
    assert fg.edge_src.shape == fg.edge_dst.shape
    logits = model.apply(params, feats, graph=fg)
    assert logits.shape == (n, C)
    assert np.isfinite(np.asarray(logits)).all()
    # full-graph aggregation must equal padded aggregation with ALL
    # neighbors sampled (fanout >= max degree -> exact)
    K = int(np.diff(row_ptr).max())
    ml_all = g.multilayer_sample(jnp.asarray(np.arange(n)), (K, K), seed=0)
    x_all = feats[ml_all.unique_gids] * ml_all.unique_mask[:, None]
    logits_pad = model.apply(params, x_all, sample=ml_all)
    np.testing.assert_allclose(
        np.asarray(logits_pad), np.asarray(logits)[:n], rtol=2e-4, atol=2e-4
    )


def test_gcn_true_degree_matches_full_graph_exactly():
    """GCN with degree_mode='true' + fanout >= max degree reproduces the
    full-graph pass at tight tolerance (block degrees only approximate it:
    a source's block out-degree misses edges to off-batch targets)."""
    n, D, C = 120, 16, 4
    row_ptr, col = hs.random_csr(n, avg_deg=6, seed=40)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
    )
    K = int(np.diff(row_ptr).max())
    rs = np.random.RandomState(41)
    feats = jnp.asarray(rs.randn(n, D).astype(np.float32))
    model = HomoGNN(
        model_type="gcn", hidden_dim=16, num_classes=C, num_layers=2,
        degree_mode="true",
    )
    ml = g.multilayer_sample(
        jnp.asarray(np.arange(n)), (K, K), seed=0, with_degrees=True
    )
    # fetched degrees are the true row_ptr diffs
    true_deg = np.diff(row_ptr)
    for li, hop in enumerate(ml.hops):
        nd = np.asarray(hop.node_degree)
        lg = np.asarray(ml.level_gids[li + 1])
        lm = np.asarray(ml.level_masks[li + 1])
        np.testing.assert_array_equal(nd[lm], true_deg[lg[lm]])
    x_all = feats[jnp.clip(ml.unique_gids, 0, n - 1)] * ml.unique_mask[:, None]
    params = model.init(jax.random.PRNGKey(0), x_all, sample=ml)
    logits_pad = model.apply(params, x_all, sample=ml)
    logits_full = model.apply(params, feats, graph=g.to_full_graph())
    np.testing.assert_allclose(
        np.asarray(logits_pad), np.asarray(logits_full)[:n], rtol=2e-5, atol=2e-5
    )
    # block-degree mode on the same batch diverges (proves the flag matters)
    model_blk = HomoGNN(
        model_type="gcn", hidden_dim=16, num_classes=C, num_layers=2,
        degree_mode="block",
    )
    logits_blk = model_blk.apply(params, x_all, sample=ml)
    assert not np.allclose(
        np.asarray(logits_blk), np.asarray(logits_full)[:n], atol=1e-3
    )


def test_gcn_degree_mode_true_requires_degrees():
    hop = make_hop(4, 3, 10)
    x = jnp.asarray(np.random.RandomState(5).randn(10, 6).astype(np.float32))
    conv = GCNConv(out_dim=4, degree_mode="true")
    with pytest.raises(AssertionError):
        conv.init(jax.random.PRNGKey(0), x, hop)


class TestSpmmTiled:
    def _clustered_csr(self, n, deg, width, seed):
        rs = np.random.RandomState(seed)
        counts = rs.randint(1, deg * 2, n)
        row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        col = np.concatenate([
            np.clip(i + rs.randint(-width, width + 1, c), 0, n - 1)
            for i, c in enumerate(counts)
        ]).astype(np.int32)
        return row_ptr, col

    def _edge_dst(self, row_ptr):
        return np.repeat(
            np.arange(len(row_ptr) - 1), np.diff(row_ptr)
        ).astype(np.int32)

    @pytest.mark.parametrize("reduce", ["sum", "mean"])
    def test_matches_segment_spmm_on_clustered(self, reduce):
        from wholegraph_tpu.ops.spmm import plan_spmm_tiles, spmm_tiled

        n, D = 2000, 32
        row_ptr, col = self._clustered_csr(n, 6, 40, seed=50)
        x = np.random.RandomState(51).randn(n, D).astype(np.float32)
        window, edge_cap, feasible = plan_spmm_tiles(row_ptr, col, tile=256)
        assert feasible
        out = np.asarray(spmm_tiled(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(x),
            window=window, edge_cap=edge_cap, tile=256, reduce=reduce,
        ))
        ref = np.asarray(S.spmm(
            jnp.asarray(col), jnp.asarray(self._edge_dst(row_ptr)),
            jnp.asarray(x), n, reduce,
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_weighted_sum_matches(self):
        from wholegraph_tpu.ops.spmm import plan_spmm_tiles, spmm_tiled

        n, D = 1024, 16
        row_ptr, col = self._clustered_csr(n, 5, 30, seed=52)
        E = int(row_ptr[-1])
        rs = np.random.RandomState(53)
        x = rs.randn(n, D).astype(np.float32)
        w = rs.rand(E).astype(np.float32)
        window, edge_cap, feasible = plan_spmm_tiles(row_ptr, col, tile=256)
        out = np.asarray(spmm_tiled(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(x),
            window=window, edge_cap=edge_cap, tile=256, edge_weight=jnp.asarray(w),
        ))
        ref = np.asarray(S.spmm(
            jnp.asarray(col), jnp.asarray(self._edge_dst(row_ptr)),
            jnp.asarray(x), n, "sum", edge_weight=jnp.asarray(w),
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_bad_plan_falls_back_exactly(self):
        """Random (non-clustered) cols with an undersized window: the
        dropped-edge check must route to the exact segment-sum path."""
        from wholegraph_tpu.ops.spmm import spmm_tiled

        n, D = 1024, 16
        rs = np.random.RandomState(54)
        counts = rs.randint(1, 8, n)
        row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        col = rs.randint(0, n, int(row_ptr[-1])).astype(np.int32)
        x = rs.randn(n, D).astype(np.float32)
        out = np.asarray(spmm_tiled(
            jnp.asarray(row_ptr), jnp.asarray(col), jnp.asarray(x),
            window=128, edge_cap=2048, tile=256,
        ))
        ref = np.asarray(S.spmm(
            jnp.asarray(col), jnp.asarray(self._edge_dst(row_ptr)),
            jnp.asarray(x), n, "sum",
        ))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_plan_flags_random_graph_infeasible(self):
        from wholegraph_tpu.ops.spmm import plan_spmm_tiles

        rs = np.random.RandomState(55)
        n = 20_000
        counts = rs.randint(1, 8, n)
        row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        col = rs.randint(0, n, int(row_ptr[-1])).astype(np.int32)
        _, _, feasible = plan_spmm_tiles(row_ptr, col, tile=512)
        assert not feasible


def test_spmm_sharded_matches_replicated():
    """Pod-scale full-graph SpMM (row-sharded features + accumulate-scatter
    output) == the replicated segment-sum SpMM, including skewed dst ids."""
    import wholegraph_tpu as wg
    from jax.sharding import NamedSharding, PartitionSpec as P
    from wholegraph_tpu.memory.sharded_table import ShardedTable
    from wholegraph_tpu.ops.spmm import sddmm_sharded, spmm_sharded

    mesh = wg.parallel.get_global_mesh()
    rs = np.random.RandomState(60)
    n, D, E = 1024, 16, 4096
    x_np = rs.randn(n, D).astype(np.float32)
    src = rs.randint(0, n, E).astype(np.int32)
    dst = np.sort(rs.randint(0, n, E)).astype(np.int32)
    dst[: E // 4] = 3  # skew: one hot destination
    dst = np.sort(dst)
    w = rs.rand(E).astype(np.float32)

    x_tab = ShardedTable.from_array(mesh, x_np)
    put = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("data")))
    for reduce in ("sum", "mean"):
        out = spmm_sharded(
            put(src), put(dst), x_tab, n, reduce,
            edge_weight=put(w) if reduce == "sum" else None,
        )
        ref = np.asarray(S.spmm(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x_np), n, reduce,
            edge_weight=jnp.asarray(w) if reduce == "sum" else None,
        ))
        np.testing.assert_allclose(
            out.to_array(), ref, rtol=2e-4, atol=2e-4, err_msg=reduce
        )

    e = np.asarray(sddmm_sharded(put(src), put(dst), x_tab, x_tab))
    ref_e = np.asarray(S.sddmm(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x_np), jnp.asarray(x_np)
    ))
    np.testing.assert_allclose(e, ref_e, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("model_type", ["sage", "gcn"])
def test_sharded_full_graph_eval_matches_replicated(model_type):
    """Pod-scale eval (features/activations/logits row-sharded, message
    passing via spmm_sharded) == the replicated full-graph apply."""
    import wholegraph_tpu as wg
    from wholegraph_tpu.memory.sharded_table import ShardedTable
    from wholegraph_tpu.models.sharded_eval import eval_full_graph_sharded

    mesh = wg.parallel.get_global_mesh()
    n, D, C = 300, 16, 5
    row_ptr, col = hs.random_csr(n, avg_deg=7, seed=70)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
    )
    rs = np.random.RandomState(71)
    feats = rs.randn(n, D).astype(np.float32)
    model = HomoGNN(
        model_type=model_type, hidden_dim=16, num_classes=C, num_layers=2,
        dropout=0.0,
    )
    fg = g.to_full_graph()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), graph=fg)
    ref = np.asarray(model.apply(params, jnp.asarray(feats), graph=fg))

    x_tab = ShardedTable.from_array(mesh, feats)
    out_tab = eval_full_graph_sharded(model, params, g, x_tab)
    got = out_tab.to_array()[:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_spmm_window_interpret_matches_segment_sum():
    """CPU (interpret-mode) coverage of the fused windowed SpMM kernel."""
    import numpy as np
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, spmm
    from wholegraph_tpu.ops.spmm_pallas import spmm_window

    rs = np.random.RandomState(1)
    n, dim, width = 1200, 128, 96
    counts = rs.randint(0, 8, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    x = rs.randn(n, dim).astype(np.float32)
    window, edge_cap, feasible = plan_spmm_tiles(rp, col, tile=256)
    edge_dst = np.repeat(np.arange(n), counts).astype(np.int32)
    ref = np.asarray(spmm(jnp.asarray(col), jnp.asarray(edge_dst),
                          jnp.asarray(x), n, "mean"))
    got = np.asarray(spmm_window(jnp.asarray(rp), jnp.asarray(col),
                                 jnp.asarray(x), window=window,
                                 edge_cap=edge_cap, tile=256, reduce="mean"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

def test_spmm_window_vjp_matches_segment_grad():
    """spmm_window's custom VJP (exact transposed segment SpMM) matches
    grads through the XLA spmm for sum/mean; weighted-sum grads flow to
    BOTH x and the edge weights (dw = the windowed SDDMM, r5)."""
    import numpy as np
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, spmm
    from wholegraph_tpu.ops.spmm_pallas import spmm_window

    rs = np.random.RandomState(5)
    n, dim, width = 900, 128, 80
    counts = rs.randint(1, 7, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    x = jnp.asarray(rs.randn(n, dim).astype(np.float32))
    window, edge_cap, feasible = plan_spmm_tiles(rp, col, tile=256)
    assert feasible
    dst = np.repeat(np.arange(n), counts).astype(np.int32)
    rpj, colj, dstj = jnp.asarray(rp), jnp.asarray(col), jnp.asarray(dst)
    for reduce in ("sum", "mean"):
        g1 = jax.grad(lambda x: jnp.sum(jnp.sin(spmm_window(
            rpj, colj, x, window=window, edge_cap=edge_cap,
            reduce=reduce))))(x)
        g2 = jax.grad(lambda x: jnp.sum(jnp.sin(spmm(
            colj, dstj, x, n, reduce))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)
    w = jnp.asarray(rs.rand(E).astype(np.float32))
    gx, gw = jax.grad(lambda x, w: jnp.sum(jnp.sin(spmm_window(
        rpj, colj, x, window=window, edge_cap=edge_cap, reduce="sum",
        edge_weight=w))), argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(lambda x, w: jnp.sum(jnp.sin(spmm(
        colj, dstj, x, n, "sum", edge_weight=w))), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-5)
    # weighted mean is rejected (weight-sum vs edge-count normalisation)
    with pytest.raises(Exception):
        spmm_window(rpj, colj, x, window=window, edge_cap=edge_cap,
                    reduce="mean", edge_weight=w)


@pytest.mark.parametrize("model_type", ["sage", "gcn"])
def test_windowed_full_graph_matches_plain(model_type):
    """to_full_graph(windowed=True) attaches a feasible plan on a clustered
    CSR, the conv layers route through the fused windowed SpMM, and both
    forward and grads match the plain COO segment path."""
    n, D, C = 600, 128, 4
    rs = np.random.RandomState(7)
    counts = rs.randint(2, 9, n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(row_ptr[-1])
    col = (
        np.repeat(np.arange(n), counts) + rs.randint(-40, 41, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=E,
        max_degree=int(counts.max()),
    )
    feats = jnp.asarray(rs.randn(n, D).astype(np.float32))
    model = HomoGNN(model_type=model_type, hidden_dim=128, num_classes=C,
                    num_layers=2)
    fg_plain = g.to_full_graph()
    fg_win = g.to_full_graph(windowed=True)
    assert fg_win.row_ptr is not None and fg_win.window is not None
    params = model.init(jax.random.PRNGKey(0), feats, graph=fg_plain)
    out_plain = model.apply(params, feats, graph=fg_plain)
    out_win = model.apply(params, feats, graph=fg_win)
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(out_plain),
                               rtol=2e-4, atol=2e-4)
    loss = lambda p, fg: jnp.sum(jnp.tanh(model.apply(p, feats, graph=fg)))
    gp = jax.grad(loss)(params, fg_plain)
    gw = jax.grad(loss)(params, fg_win)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        gp, gw,
    )


def test_windowed_full_graph_infeasible_falls_back():
    """A random (non-clustered) CSR yields an infeasible plan (window ~ n
    exceeds the max(2048, n/4) locality bar); windowed=True silently
    returns the plain COO view."""
    n = 20_000
    row_ptr, col = hs.random_csr(n, avg_deg=6, seed=8)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
    )
    fg = g.to_full_graph(windowed=True)
    assert fg.row_ptr is None and fg.window is None


def test_sddmm_window_interpret_matches_xla():
    """Windowed SDDMM (round 4): per-tile S = a @ window^T + one-hot
    extraction vs the XLA per-edge sddmm."""
    import numpy as np
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, sddmm
    from wholegraph_tpu.ops.spmm_pallas import sddmm_window

    rs = np.random.RandomState(9)
    n, dim, width = 1500, 128, 90
    counts = rs.randint(0, 9, n)  # includes empty rows
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
                                  window=window, edge_cap=edge_cap,
                                  tile=256))
    assert got.shape == (E,)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_sddmm_window_vjp_matches_xla_grads():
    """sddmm_window's VJP (da = weighted windowed SpMM on the same plan,
    db = transposed XLA segment path) matches autodiff through the XLA
    per-edge sddmm (r5 — the GAT attention-gradient path)."""
    import numpy as np
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, sddmm
    from wholegraph_tpu.ops.spmm_pallas import sddmm_window

    rs = np.random.RandomState(11)
    n, dim, width = 1100, 128, 70
    counts = rs.randint(0, 8, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    a = jnp.asarray(rs.randn(n, dim).astype(np.float32))
    b = jnp.asarray(rs.randn(n, dim).astype(np.float32))
    window, edge_cap, feasible = plan_spmm_tiles(rp, col, tile=256)
    assert feasible
    dst = np.repeat(np.arange(n), counts).astype(np.int32)
    rpj, colj, dstj = jnp.asarray(rp), jnp.asarray(col), jnp.asarray(dst)
    da, db = jax.grad(lambda a, b: jnp.sum(jnp.sin(sddmm_window(
        rpj, colj, a, b, window=window, edge_cap=edge_cap))),
        argnums=(0, 1))(a, b)
    da_ref, db_ref = jax.grad(lambda a, b: jnp.sum(jnp.sin(sddmm(
        colj, dstj, a, b))), argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("add_self_loop", [True, False])
def test_gat_windowed_full_graph_matches_plain(add_self_loop):
    """GATConv's fused full-graph branch (edge-softmax + per-head weighted
    windowed SpMM, the mha_gat_n2n analog) matches the per-edge XLA path in
    forward AND parameter/feature gradients — including the attention
    gradients through spmm_window's dw (r5)."""
    import dataclasses as _dc
    import numpy as np
    from wholegraph_tpu.models.conv import GATConv

    n, D, H = 700, 64, 4
    rs = np.random.RandomState(13)
    counts = rs.randint(0, 7, n)  # includes empty rows
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(row_ptr[-1])
    col = (
        np.repeat(np.arange(n), counts) + rs.randint(-35, 36, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=E,
        max_degree=int(counts.max()),
    )
    fg_plain = g.to_full_graph()
    fg_win = g.to_full_graph(windowed=True)
    assert fg_win.row_ptr is not None
    feats = jnp.asarray(rs.randn(n, 48).astype(np.float32))
    layer = GATConv(out_dim=D, num_heads=H, add_self_loop=add_self_loop)
    params = layer.init(jax.random.PRNGKey(1), feats, fg_plain)
    out_plain = layer.apply(params, feats, fg_plain)
    out_win = layer.apply(params, feats, fg_win)
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(out_plain),
                               rtol=3e-4, atol=3e-4)

    def loss(p, x, fg):
        return jnp.sum(jnp.tanh(layer.apply(p, x, fg)))

    gp_p, gx_p = jax.grad(loss, argnums=(0, 1))(params, feats, fg_plain)
    gp_w, gx_w = jax.grad(loss, argnums=(0, 1))(params, feats, fg_win)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        gp_p, gp_w,
    )
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_p),
                               rtol=1e-3, atol=1e-3)
    # the attention params must get REAL gradients through the fused path
    assert float(jnp.abs(gp_w["params"]["attn_src"]).max()) > 0


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_padded_reduce_windowed_matches_plain(reduce):
    """Sampled-block aggregation through per-run windowed SpMM passes + the
    exact residual (r5): must equal padded_reduce on a real multilayer
    sample over a clustered graph, for generous and for tiny windows (tiny
    windows push everything through the residual/fallback paths)."""
    import numpy as np
    from wholegraph_tpu.ops.spmm import padded_reduce, padded_reduce_windowed

    n, D = 2000, 128
    rs = np.random.RandomState(17)
    counts = rs.randint(2, 8, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts) + rs.randint(-30, 31, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(rp), col=jnp.asarray(col), node_count=n,
        edge_count=E, max_degree=int(counts.max()),
    )
    centers = jnp.asarray(np.sort(rs.choice(n, 64, replace=False)).astype(np.int32))
    ml = g.multilayer_sample(centers, (4, 3), seed=1)
    hop = ml.hops[1]  # the big block: level-1 targets x K=3
    U = ml.unique_gids.shape[0]
    x = jnp.asarray(rs.randn(U, D).astype(np.float32))
    ref = np.asarray(padded_reduce(x, hop.nbr_idx, hop.mask, reduce))
    rb = ml.run_bounds(1)
    assert rb[-1] == U and len(rb) == 4
    for windows in (512, 128):
        got = np.asarray(padded_reduce_windowed(
            x, hop.nbr_idx, hop.mask, reduce,
            run_bounds=rb, windows=windows, tile=256,
        ))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"windows={windows}")
    # gradient w.r.t. x matches the padded path
    gw = jax.grad(lambda x: jnp.sum(jnp.sin(padded_reduce_windowed(
        x, hop.nbr_idx, hop.mask, reduce, run_bounds=rb, windows=512,
        tile=256))))(x)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(padded_reduce(
        x, hop.nbr_idx, hop.mask, reduce))))(x)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gr),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("model_type", ["sage", "gcn"])
def test_sampled_windowed_agg_matches_plain(model_type):
    """MultilayerSample.with_windowed_agg routes the conv layers' sampled
    reduces through padded_reduce_windowed; forward + grads must match the
    padded path on a clustered graph."""
    import numpy as np

    n, D, C = 1500, 128, 4
    rs = np.random.RandomState(23)
    counts = rs.randint(2, 8, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts) + rs.randint(-40, 41, E)
    ).clip(0, n - 1).astype(np.int32)
    g = GraphStructure(
        row_ptr=jnp.asarray(rp), col=jnp.asarray(col), node_count=n,
        edge_count=E, max_degree=int(counts.max()),
    )
    centers = jnp.asarray(
        np.sort(rs.choice(n, 64, replace=False)).astype(np.int32)
    )
    ml = g.multilayer_sample(centers, (4, 3), seed=2)
    mlw = ml.with_windowed_agg(512)
    assert mlw.hops[0].run_bounds is not None
    U = ml.unique_gids.shape[0]
    x = jnp.asarray(rs.randn(U, D).astype(np.float32))
    model = HomoGNN(model_type=model_type, hidden_dim=128, num_classes=C,
                    num_layers=2)
    params = model.init(jax.random.PRNGKey(0), x, sample=ml)
    out_p = np.asarray(model.apply(params, x, sample=ml))
    out_w = np.asarray(model.apply(params, x, sample=mlw))
    np.testing.assert_allclose(out_w, out_p, rtol=3e-4, atol=3e-4)
    loss = lambda p, s: jnp.sum(jnp.tanh(model.apply(p, x, sample=s)))
    gp = jax.grad(loss)(params, ml)
    gw = jax.grad(loss)(params, mlw)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        gp, gw,
    )


def test_sddmm_chunked_matches_plain():
    E, N, D = 5000, 300, 64
    rs = np.random.RandomState(33)
    src = rs.randint(0, N, E).astype(np.int32)
    dst = rs.randint(0, N, E).astype(np.int32)
    a = jnp.asarray(rs.randn(N, D).astype(np.float32))
    b = jnp.asarray(rs.randn(N, D).astype(np.float32))
    ref = np.asarray(S.sddmm(jnp.asarray(src), jnp.asarray(dst), a, b))
    got = np.asarray(S.sddmm_chunked(jnp.asarray(src), jnp.asarray(dst), a, b,
                                     chunk=512))
    np.testing.assert_allclose(got, ref, rtol=1e-6)

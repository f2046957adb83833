"""Edge-partitioned halo-exchange graph tests (graph/partitioned.py).

Exactness vs the replicated segment-sum SpMM, plan generality (equal /
custom / round-robin), wire-volume savings on clustered layouts, and the
pod-scale halo eval path vs the replicated model apply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import wholegraph_tpu as wg
from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.graph.partitioned import (
    degrees,
    eval_full_graph_partitioned,
    halo_stats,
    partition_graph,
    spmm_halo,
)
from wholegraph_tpu.memory.partition import PartitionPlan
from wholegraph_tpu.memory.sharded_table import ShardedTable
from wholegraph_tpu.models import HomoGNN
from wholegraph_tpu.ops import spmm as S

import host_sampler as hs


def _graph(n, avg_deg, seed, weighted=False):
    row_ptr, col = hs.random_csr(n, avg_deg=avg_deg, seed=seed)
    w = None
    if weighted:
        w = np.random.RandomState(seed + 1).rand(len(col)).astype(np.float32)
    return GraphStructure(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col=jnp.asarray(col),
        node_count=n,
        edge_count=int(row_ptr[-1]),
        max_degree=int(np.diff(row_ptr).max()),
        edge_weight=None if w is None else jnp.asarray(w),
    ), row_ptr, col, w


def _ref_spmm(row_ptr, col, x, reduce, w=None):
    dst = np.repeat(np.arange(len(row_ptr) - 1), np.diff(row_ptr))
    return np.asarray(
        S.spmm(
            jnp.asarray(col, jnp.int32), jnp.asarray(dst, jnp.int32),
            jnp.asarray(x), len(row_ptr) - 1, reduce,
            edge_weight=None if w is None else jnp.asarray(w),
        )
    )


@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_spmm_halo_matches_replicated(reduce):
    mesh = wg.parallel.get_global_mesh()
    n, D = 300, 16
    g, row_ptr, col, _ = _graph(n, avg_deg=7, seed=80)
    x = np.random.RandomState(81).randn(n, D).astype(np.float32)
    x_tab = ShardedTable.from_array(mesh, x)
    pg = partition_graph(g, mesh)
    out = spmm_halo(pg, x_tab, reduce)
    ref = _ref_spmm(row_ptr, col, x, reduce)
    if reduce == "max":
        # spmm_halo zeroes isolated destinations (padded_reduce semantics);
        # the edge-list spmm leaves segment_max's -inf there
        ref = np.where(np.isneginf(ref), 0.0, ref)
    np.testing.assert_allclose(
        out.to_array(), ref, rtol=2e-4, atol=2e-4, err_msg=reduce
    )


def test_spmm_halo_weighted_sum():
    mesh = wg.parallel.get_global_mesh()
    n, D = 257, 8
    g, row_ptr, col, w = _graph(n, avg_deg=5, seed=82, weighted=True)
    x = np.random.RandomState(83).randn(n, D).astype(np.float32)
    x_tab = ShardedTable.from_array(mesh, x)
    pg = partition_graph(g, mesh)
    out = spmm_halo(pg, x_tab, "sum", use_weights=True)
    ref = _ref_spmm(row_ptr, col, x, "sum", w=w)
    np.testing.assert_allclose(out.to_array(), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["custom", "round_robin"])
def test_spmm_halo_nonstandard_plans(mode):
    """Halo partition + aggregation under non-equal and round-robin row
    plans (the reference's rank_entry_partition / round-robin shards)."""
    mesh = wg.parallel.get_global_mesh()
    world = mesh.shape["data"]
    n, D = 200, 8
    if mode == "custom":
        rs = np.random.RandomState(84)
        cuts = np.sort(rs.choice(np.arange(1, n), world - 1, replace=False))
        parts = np.diff(np.concatenate([[0], cuts, [n]]))
        plan = PartitionPlan.custom(tuple(int(p) for p in parts))
    else:
        plan = PartitionPlan.round_robin(n, world, block=16)
    g, row_ptr, col, _ = _graph(n, avg_deg=6, seed=85)
    x = np.random.RandomState(86).randn(n, D).astype(np.float32)
    x_tab = ShardedTable.from_array(mesh, x, plan=plan)
    pg = partition_graph(g, mesh, plan=plan)
    out = spmm_halo(pg, x_tab, "mean")
    ref = _ref_spmm(row_ptr, col, x, "mean")
    np.testing.assert_allclose(out.to_array(), ref, rtol=2e-4, atol=2e-4)


def test_halo_wire_savings_on_clustered_graph():
    """A community-ordered graph (edges mostly within owner-aligned blocks)
    must move FAR fewer rows than the per-edge path — the reason this layout
    exists — while staying exact."""
    mesh = wg.parallel.get_global_mesh()
    world = mesh.shape["data"]
    n, deg = 512, 12
    rs = np.random.RandomState(87)
    blk = n // world
    src_l, dst_l = [], []
    for v in range(n):
        b = v // blk
        for _ in range(deg):
            if rs.rand() < 0.95:  # intra-community edge
                src_l.append(b * blk + rs.randint(blk))
            else:
                src_l.append(rs.randint(n))
            dst_l.append(v)
    g = GraphStructure.from_coo(
        np.array(dst_l), np.array(src_l), n  # from_coo sorts by src → our dst
    )
    # from_coo builds CSR over its `src` arg; we want rows = destinations
    row_ptr = np.asarray(g.row_ptr)
    col = np.asarray(g.col)
    pg = partition_graph(g, mesh)
    st = halo_stats(pg)
    assert st["savings_x"] > 5.0, st
    x = rs.randn(n, 8).astype(np.float32)
    x_tab = ShardedTable.from_array(mesh, x)
    out = spmm_halo(pg, x_tab, "sum")
    ref = _ref_spmm(row_ptr, col, x, "sum")
    np.testing.assert_allclose(out.to_array(), ref, rtol=2e-4, atol=2e-4)


def test_degrees_matches_bincount():
    mesh = wg.parallel.get_global_mesh()
    n = 150
    g, row_ptr, _, _ = _graph(n, avg_deg=4, seed=88)
    pg = partition_graph(g, mesh)
    got = degrees(pg).to_array()[:, 0]
    np.testing.assert_array_equal(got, np.diff(row_ptr).astype(np.float32))


@pytest.mark.parametrize("model_type", ["sage", "gcn", "gat", "rgcn"])
def test_halo_full_graph_eval_matches_replicated(model_type):
    """All four conv stacks through the halo layout == replicated apply.
    GAT attention and RGCN per-relation means are destination-local under
    the dst-owner partition, so they too need only the one halo gather."""
    mesh = wg.parallel.get_global_mesh()
    n, D, C, R = 300, 16, 5, 3
    rs = np.random.RandomState(91)
    if model_type == "rgcn":
        row_ptr, col = hs.random_csr(n, avg_deg=7, seed=90)
        g = GraphStructure(
            row_ptr=jnp.asarray(row_ptr, jnp.int32),
            col=jnp.asarray(col),
            node_count=n,
            edge_count=int(row_ptr[-1]),
            max_degree=int(np.diff(row_ptr).max()),
            edge_type=jnp.asarray(rs.randint(0, R, int(row_ptr[-1])), jnp.int32),
            num_relations=R,
        )
    else:
        g, _, _, _ = _graph(n, avg_deg=7, seed=90)
    feats = rs.randn(n, D).astype(np.float32)
    model = HomoGNN(
        model_type=model_type, hidden_dim=16, num_classes=C, num_layers=2,
        dropout=0.0, num_heads=4, num_relations=R,
    )
    fg = g.to_full_graph()
    kw = {}
    if model_type == "rgcn":
        et = np.asarray(g.edge_type)
        kw["edge_types"] = [jnp.asarray(et)] * 2
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), graph=fg, **kw)
    ref = np.asarray(model.apply(params, jnp.asarray(feats), graph=fg, **kw))
    x_tab = ShardedTable.from_array(mesh, feats)
    pg = partition_graph(g, mesh)
    out_tab = eval_full_graph_partitioned(model, params, pg, x_tab)
    np.testing.assert_allclose(
        out_tab.to_array()[:n], ref, rtol=5e-4, atol=5e-4
    )

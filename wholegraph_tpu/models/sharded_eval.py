"""Pod-scale full-graph evaluation: every activation row-sharded.

The example's ``--full-graph-eval`` gathers all features to a replicated
array — fine while ``n*dim`` fits one chip, impossible at papers100M scale
(111M x 128 f32 = 57 GB).  This module re-runs a trained HomoGNN's conv
stack with features, activations, and logits kept as row-sharded tables,
and message passing done by :func:`ops.spmm.spmm_sharded` (exact a2a
gather + accumulate-scatter).  Dense projections apply replicated weights
to sharded rows — GSPMD keeps the row sharding through the matmul.

Reference context: the reference evaluates through per-rank DGL blocks
over the multi-GPU store (examples/node_classfication.py test loop); here
the whole-graph pass itself is distributed.

Supported conv stacks: 'sage' (mean aggregator) and 'gcn' — the two whose
full-graph math is a pure SpMM composition.  Params come verbatim from
the trained HomoGNN (flax auto-naming: SAGEConv_0/GCNConv_0, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..memory.sharded_table import ShardedTable
from ..ops.gather import scatter as _dist_scatter
from ..ops.spmm import spmm_sharded
from ..utils.error import check_input

Array = jax.Array


def _shard_edges(g, mesh, axis: str):
    """FullGraph COO -> per-device edge ranges padded with OOB sentinels
    (OOB src gathers zero rows, OOB dst scatters are dropped — padding is
    free through the exact exchange)."""
    fg = g.to_full_graph()
    world = int(np.prod([mesh.shape[a] for a in (axis if isinstance(axis, tuple) else (axis,))]))
    E = fg.edge_src.shape[0]
    pad = -E % world
    n = g.node_count
    src = jnp.concatenate([fg.edge_src, jnp.full((pad,), n, jnp.int32)]) if pad else fg.edge_src
    dst = jnp.concatenate([fg.edge_dst, jnp.full((pad,), n, jnp.int32)]) if pad else fg.edge_dst
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(src, sh), jax.device_put(dst, sh)


def _degree_table(dst: Array, n: int, mesh, axis) -> ShardedTable:
    cnt = ShardedTable.create(mesh, n, 1)
    ones = jnp.ones((dst.shape[0], 1), jnp.float32)
    data = _dist_scatter(
        cnt.data, dst, ones, plan=cnt.plan, mesh=mesh, axis=axis,
        accumulate=True, donate=True,
    )
    return ShardedTable(data, cnt.plan, mesh, axis)


def eval_full_graph_sharded(model, params, g, x_tab: ShardedTable) -> ShardedTable:
    """Logits for EVERY node as a row-sharded table (never replicated).

    model: the trained HomoGNN (model_type 'sage' or 'gcn');
    params: its flax params; g: GraphStructure; x_tab: row-sharded features.
    """
    mt = model.model_type.lower()
    check_input(mt in ("sage", "gcn"), f"sharded eval supports sage|gcn, got {mt}")
    if mt == "sage":
        check_input(model.aggregator == "mean", "sharded sage eval: mean only")
    mesh, axis = x_tab.mesh, x_tab.axis
    n = g.node_count
    src, dst = _shard_edges(g, mesh, axis)
    p = params["params"]
    prefix = "SAGEConv" if mt == "sage" else "GCNConv"
    x = x_tab
    if mt == "gcn":
        deg = _degree_table(dst, n, mesh, axis)
        inv = ShardedTable(
            jax.lax.rsqrt(deg.data + 1.0), deg.plan, mesh, axis
        )
    for i in range(model.num_layers):
        lp = p[f"{prefix}_{i}"]
        if mt == "sage":
            agg = spmm_sharded(src, dst, x, n, "mean")
            h = jnp.concatenate([x.data, agg.data], axis=-1)
            h = h @ lp["proj"]["kernel"] + lp["proj"]["bias"]
        else:
            h = x.data @ lp["proj"]["kernel"]
            hx = ShardedTable(h * inv.data, x.plan, mesh, axis)
            agg = spmm_sharded(src, dst, hx, n, "sum")
            h = (agg.data + hx.data) * inv.data
            if "bias" in lp:
                h = h + lp["bias"]
        if i < model.num_layers - 1:
            h = jax.nn.relu(h)  # dropout off at eval
        x = ShardedTable(h, x.plan, mesh, axis)
    return x

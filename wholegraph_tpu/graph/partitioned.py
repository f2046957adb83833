"""Edge-partitioned graphs with halo exchange — the pod-scale SpMM layout.

The BASELINE north star calls for *edge-partitioned* multi-host graphs with
boundary (halo) exchange.  :func:`ops.spmm.spmm_sharded` already partitions
edges across devices, but it pays wire cost **per edge**: E gathered source
rows + E scattered messages ride the all-to-all every layer.  This module
precomputes, per device, (a) the edges whose DESTINATION the device owns and
(b) the unique REMOTE source nodes those edges touch (the halo).  A layer
then costs exactly one distributed gather of ``sum_d |halo_d|`` rows; the
aggregation itself is device-local (take + sorted segment-sum — every edge
of a destination lives with its owner, so local partial sums are the full
sums and NO output scatter collective is needed).

For locality-partitioned graphs (METIS/community-ordered ids — the standard
production layout) ``|halo| << E``: the measured synthetic-community graph in
the tests moves ~20x fewer rows than the per-edge path.  For adversarial
random graphs the halo degenerates to ~min(E, n) rows per device and the
per-edge path may win; :func:`halo_stats` reports both volumes so callers
can choose.

Reference context: WholeGraph keeps the graph row-sharded in WholeMemory and
pays per-edge NCCL gathers (reference: cpp/src/wholememory_ops/gather_op_impl_nccl.cu:34-185
drives every feature fetch; cpp/src/wholegraph_ops distributed sampling
likewise fetches per edge).  A halo tier has no reference counterpart — it
exceeds reference parity for full-graph passes.

All mapping math runs host-side (numpy) at partition time; the runtime path
is one exact a2a gather + an lru-cached ``jit(shard_map(...))`` local
aggregate (the eager-API invariant from the dev guide).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..memory.partition import PartitionPlan
from ..memory.sharded_table import ShardedTable
from ..ops.gather import axis_size as _axis_size
from ..utils.error import check_input

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-max(x, 1) // m) * m


def _owner_slot_np(plan: PartitionPlan, ids: np.ndarray):
    phys = plan.physical_index_np(ids)
    return phys // plan.capacity, phys % plan.capacity


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PartitionedGraph:
    """Per-device edge lists in LOCAL index space + per-device halo id lists.

    Physical layouts (all sharded ``P(axis)`` over ``mesh``):
      src_slot: ``[world*e_cap]`` — per edge, an index into the device-local
        source space ``concat([own shard slots (capacity), halo rows (h_cap),
        one zero row])``; padding edges point at the zero row.
      dst_slot: ``[world*e_cap]`` — per edge, the local slot of its
        destination (0..capacity); padding edges park at ``capacity`` and are
        sliced off.  Sorted ascending per device (CSR order is preserved).
      halo_ids: ``[world*h_cap]`` — per device, the unique remote source
        node ids it needs each layer; padded with the OOB sentinel ``n``
        (the exact gather serves OOB as zero rows without exchanging them).
      edge_weight: optional ``[world*e_cap]`` f32, 0 on padding.
    """

    src_slot: Array
    dst_slot: Array
    halo_ids: Array
    edge_weight: Optional[Array]
    plan: PartitionPlan
    mesh: Mesh
    axis: str
    node_count: int
    edge_count: int
    e_cap: int
    h_cap: int
    halo_rows_total: int  # real (non-pad) halo ids, summed over devices
    edge_type: Optional[Array] = None  # [world*e_cap] relation ids (RGCN)
    num_relations: int = 0

    def tree_flatten(self):
        return (
            self.src_slot, self.dst_slot, self.halo_ids, self.edge_weight,
            self.edge_type,
        ), (
            self.plan, self.mesh, self.axis, self.node_count, self.edge_count,
            self.e_cap, self.h_cap, self.halo_rows_total, self.num_relations,
        )

    @classmethod
    def tree_unflatten(cls, aux, ch):
        src, dst, halo, ew, et = ch
        plan, mesh, axis, n, e, ec, hc, ht, nr = aux
        return cls(src, dst, halo, ew, plan, mesh, axis, n, e, ec, hc, ht,
                   edge_type=et, num_relations=nr)


def partition_graph(
    g,
    mesh: Mesh,
    *,
    axis: str = "data",
    plan: Optional[PartitionPlan] = None,
) -> PartitionedGraph:
    """Build the halo layout for ``g`` (a :class:`GraphStructure`).

    Each edge ``(src=col[e], dst=row(e))`` goes to the owner of its
    destination under ``plan`` (which must be the feature table's plan so
    output shards align with table shards).  Host-side numpy; O(E log E).
    """
    world = _axis_size(mesh, axis)
    n = g.node_count
    if plan is None:
        plan = PartitionPlan.equal(n, world)
    check_input(plan.world == world, "plan world != mesh axis size")
    check_input(plan.n == n, "plan rows != graph nodes")

    rp = np.asarray(
        g.row_ptr.to_array() if hasattr(g.row_ptr, "to_array") else g.row_ptr,
        dtype=np.int64,
    )
    col = np.asarray(
        g.col.to_array() if hasattr(g.col, "to_array") else g.col, dtype=np.int64
    )
    w = None
    if g.edge_weight is not None:
        w = np.asarray(
            g.edge_weight.to_array()
            if hasattr(g.edge_weight, "to_array")
            else g.edge_weight,
            dtype=np.float32,
        )
    et = None
    if getattr(g, "edge_type", None) is not None:
        et = np.asarray(
            g.edge_type.to_array()
            if hasattr(g.edge_type, "to_array")
            else g.edge_type,
            dtype=np.int32,
        )
    dst = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))
    dst_own, dst_slot_all = _owner_slot_np(plan, dst)
    src_own, src_slot_all = _owner_slot_np(plan, col)

    cap = plan.capacity
    per_src, per_dst, per_halo, per_w, per_et = [], [], [], [], []
    halo_total = 0
    for d in range(world):
        m = dst_own == d
        s, ds = col[m], dst_slot_all[m]
        local = src_own[m] == d
        remote = np.unique(s[~local])
        halo_total += len(remote)
        sl = np.where(
            local,
            src_slot_all[m],
            cap + np.searchsorted(remote, s),
        ).astype(np.int64)
        per_src.append(sl)
        per_dst.append(ds)
        per_halo.append(remote)
        if w is not None:
            per_w.append(w[m])
        if et is not None:
            per_et.append(et[m])

    e_cap = _round_up(max(len(x) for x in per_src), 8)
    h_cap = _round_up(max(len(h) for h in per_halo), 8)
    src_buf = np.full((world, e_cap), cap + h_cap, dtype=np.int32)
    dst_buf = np.full((world, e_cap), cap, dtype=np.int32)
    halo_buf = np.full((world, h_cap), n, dtype=np.int64)
    w_buf = np.zeros((world, e_cap), dtype=np.float32) if w is not None else None
    et_buf = np.zeros((world, e_cap), dtype=np.int32) if et is not None else None
    for d in range(world):
        k = len(per_src[d])
        src_buf[d, :k] = per_src[d]
        dst_buf[d, :k] = per_dst[d]
        halo_buf[d, : len(per_halo[d])] = per_halo[d]
        if w_buf is not None:
            w_buf[d, :k] = per_w[d]
        if et_buf is not None:
            et_buf[d, :k] = per_et[d]

    sh1 = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(jnp.asarray(a.reshape(-1)), sh1)
    idt = jnp.int32 if n < 2**31 - 1 else jnp.int64
    return PartitionedGraph(
        src_slot=put(src_buf),
        dst_slot=put(dst_buf),
        halo_ids=put(halo_buf.astype(idt)),
        edge_weight=None if w_buf is None else put(w_buf),
        plan=plan,
        mesh=mesh,
        axis=axis,
        node_count=n,
        edge_count=int(rp[-1]),
        e_cap=e_cap,
        h_cap=h_cap,
        halo_rows_total=halo_total,
        edge_type=None if et_buf is None else put(et_buf),
        num_relations=int(getattr(g, "num_relations", 0) or 0),
    )


def halo_stats(pg: PartitionedGraph) -> dict:
    """Wire-volume comparison: rows moved per layer by the halo path vs the
    per-edge :func:`ops.spmm.spmm_sharded` path (gather E + scatter E)."""
    return {
        "halo_rows": pg.halo_rows_total,
        "per_edge_rows": 2 * pg.edge_count,
        "savings_x": (2 * pg.edge_count) / max(pg.halo_rows_total, 1),
        "e_cap": pg.e_cap,
        "h_cap": pg.h_cap,
    }


@functools.lru_cache(maxsize=None)
def _build_halo_agg_fn(mesh, axis, cap, e_cap, h_cap, reduce, weighted):
    """Local aggregate over (shard, halo block, edge slots): every dst's full
    in-edge set is device-local, so sorted segment ops produce the exact
    output shard with no collective."""

    def local(shard, halo, src_slot, dst_slot, wloc):
        xloc = jnp.concatenate(
            [shard, halo, jnp.zeros((1, shard.shape[1]), shard.dtype)]
        )
        msgs = jnp.take(xloc, src_slot, axis=0)
        if weighted:
            msgs = msgs * wloc[:, None]
        if reduce == "max":
            out = jax.ops.segment_max(
                msgs, dst_slot, num_segments=cap + 1, indices_are_sorted=True
            )[:cap]
            has = (
                jax.ops.segment_sum(
                    jnp.ones((e_cap,), jnp.float32), dst_slot,
                    num_segments=cap + 1, indices_are_sorted=True,
                )[:cap]
                > 0
            )
            return jnp.where(has[:, None], out, 0).astype(shard.dtype)
        out = jax.ops.segment_sum(
            msgs, dst_slot, num_segments=cap + 1, indices_are_sorted=True
        )[:cap]
        if reduce == "mean":
            cnt = jax.ops.segment_sum(
                jnp.ones((e_cap,), msgs.dtype), dst_slot,
                num_segments=cap + 1, indices_are_sorted=True,
            )[:cap]
            out = out / jnp.maximum(cnt, 1)[:, None]
        return out.astype(shard.dtype)

    def body(shard, halo, src_slot, dst_slot, wloc):
        if not weighted:
            return local(shard, halo, src_slot, dst_slot, None)
        return local(shard, halo, src_slot, dst_slot, wloc)

    specs_in = [P(axis, None), P(axis, None), P(axis), P(axis)]
    if weighted:
        specs_in.append(P(axis))
    else:
        body = functools.partial(body, wloc=None)
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(specs_in),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _build_degree_fn(mesh, axis, cap, e_cap):
    def body(dst_slot):
        return jax.ops.segment_sum(
            jnp.ones((e_cap, 1), jnp.float32), dst_slot,
            num_segments=cap + 1, indices_are_sorted=True,
        )[:cap]

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis, None),
            check_vma=False,
        )
    )


def degrees(pg: PartitionedGraph) -> ShardedTable:
    """In-degree of every node as a row-sharded ``[n, 1]`` table — purely
    local (each device counts its own edges; counts are already complete)."""
    fn = _build_degree_fn(pg.mesh, pg.axis, pg.plan.capacity, pg.e_cap)
    return ShardedTable(fn(pg.dst_slot), pg.plan, pg.mesh, pg.axis)


def spmm_halo(
    pg: PartitionedGraph,
    x_tab: ShardedTable,
    reduce: str = "sum",
    *,
    use_weights: bool = False,
    capacity_factor: float = 2.0,
) -> ShardedTable:
    """out[d] = reduce_{(s,d) in E} (w_e *) x[s], features AND output
    row-sharded; wire cost = one exact gather of the halo rows only.

    ``x_tab``'s plan must be the plan the graph was partitioned with.
    """
    check_input(reduce in ("sum", "mean", "max"), f"unknown reduce {reduce!r}")
    check_input(
        x_tab.plan == pg.plan and x_tab.axis == pg.axis,
        "feature table plan/axis != partition plan (repartition the graph)",
    )
    check_input(x_tab.data.ndim == 2, "spmm_halo expects a 2-D [rows, D] table")
    check_input(not use_weights or pg.edge_weight is not None,
                "graph was partitioned without edge weights")
    halo_rows = x_tab.gather(pg.halo_ids, capacity_factor=capacity_factor)
    fn = _build_halo_agg_fn(
        pg.mesh, pg.axis, pg.plan.capacity, pg.e_cap, pg.h_cap, reduce,
        bool(use_weights),
    )
    args = (x_tab.data, halo_rows, pg.src_slot, pg.dst_slot)
    if use_weights:
        args = args + (pg.edge_weight,)
    return ShardedTable(fn(*args), pg.plan, pg.mesh, pg.axis)


@functools.lru_cache(maxsize=None)
def _build_gat_agg_fn(mesh, axis, cap, e_cap, h_cap, H, D, neg_slope, concat):
    """One GAT head-block over the halo layout.  Attention is destination-
    local: every in-edge of a dst lives with its owner, so the per-dst
    softmax (with the self-loop folded in analytically) needs no collective.
    Matches GATConv's full-graph branch (models/conv.py) incl. self loops."""

    def body(featv, halo, src_slot, dst_slot, a_src, a_dst):
        # featv [cap, H*D] local projected rows; halo [h_cap, H*D]
        xloc = jnp.concatenate(
            [featv, halo, jnp.zeros((1, H * D), featv.dtype)]
        ).reshape(cap + h_cap + 1, H, D)
        e_src = jnp.einsum("nhd,hd->nh", xloc, a_src)  # [cap+h_cap+1, H]
        e_dst = jnp.einsum("chd,hd->ch", xloc[:cap], a_dst)  # [cap, H]
        e_dst_f = jnp.concatenate([e_dst, jnp.zeros((1, H), e_dst.dtype)])
        lg = jax.nn.leaky_relu(
            e_src[src_slot] + e_dst_f[dst_slot], negative_slope=neg_slope
        )  # [e_cap, H]
        mx = jax.ops.segment_max(
            lg, dst_slot, num_segments=cap + 1, indices_are_sorted=True
        )[:cap]
        self_lg = jax.nn.leaky_relu(
            e_src[:cap] + e_dst, negative_slope=neg_slope
        )  # [cap, H]
        m = jnp.maximum(mx, self_lg)
        m_f = jnp.concatenate([m, jnp.zeros((1, H), m.dtype)])
        ee = jnp.exp(lg - m_f[dst_slot])  # [e_cap, H]
        denom = (
            jax.ops.segment_sum(
                ee, dst_slot, num_segments=cap + 1, indices_are_sorted=True
            )[:cap]
            + jnp.exp(self_lg - m)
        )
        num = (
            jax.ops.segment_sum(
                (ee[:, :, None] * xloc[src_slot]).reshape(e_cap, H * D),
                dst_slot, num_segments=cap + 1, indices_are_sorted=True,
            )[:cap].reshape(cap, H, D)
            + jnp.exp(self_lg - m)[:, :, None] * xloc[:cap]
        )
        out = num / denom[:, :, None]  # [cap, H, D]
        if concat:
            return out.reshape(cap, H * D)
        return out.mean(axis=1)

    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis), P(axis),
                      P(None, None), P(None, None)),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _build_rgcn_agg_fn(mesh, axis, cap, e_cap, h_cap, R, Dout):
    """Per-relation mean aggregation over the halo layout (RGCNConv's
    full-graph branch): messages are relation-transformed rows; the
    (dst, relation) segment means are destination-local."""

    def body(h, halo_h, src_slot, dst_slot, etype):
        # h [cap, R*Dout] relation-transformed local rows; halo likewise
        xloc = jnp.concatenate(
            [h, halo_h, jnp.zeros((1, R * Dout), h.dtype)]
        ).reshape(cap + h_cap + 1, R, Dout)
        msgs = jnp.take_along_axis(
            xloc[src_slot], etype[:, None, None], axis=1
        )[:, 0]  # [e_cap, Dout]
        seg = jnp.minimum(dst_slot, cap) * R + etype
        seg = jnp.where(dst_slot >= cap, cap * R, seg)  # park pads
        summed = jax.ops.segment_sum(
            msgs, seg, num_segments=cap * R + 1, indices_are_sorted=False
        )[: cap * R].reshape(cap, R, Dout)
        cnt = jax.ops.segment_sum(
            jnp.ones((e_cap,), h.dtype), seg, num_segments=cap * R + 1,
            indices_are_sorted=False,
        )[: cap * R].reshape(cap, R, 1)
        return jnp.sum(summed / jnp.maximum(cnt, 1), axis=1)  # [cap, Dout]

    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis), P(axis), P(axis)),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


def _gat_layer_halo(pg, x, lp, H, D, concat, capacity_factor):
    kernel = lp["proj"]["kernel"]
    din = x.dim
    feat_local = x.data @ kernel
    if din <= H * D:  # gather narrow raw rows, project the halo locally
        halo = x.gather(pg.halo_ids, capacity_factor=capacity_factor) @ kernel
    else:  # projected rows are narrower — gather those
        feat = ShardedTable(feat_local, pg.plan, pg.mesh, pg.axis)
        halo = feat.gather(pg.halo_ids, capacity_factor=capacity_factor)
    fn = _build_gat_agg_fn(
        pg.mesh, pg.axis, pg.plan.capacity, pg.e_cap, pg.h_cap, H, D, 0.2,
        concat,
    )
    return fn(feat_local, halo, pg.src_slot, pg.dst_slot,
              lp["attn_src"], lp["attn_dst"])


def _rgcn_layer_halo(pg, x, lp, capacity_factor):
    check_input(pg.edge_type is not None,
                "graph was partitioned without edge types")
    W = lp["w_rel"]  # [R, Din, Dout]
    R, _, Dout = W.shape
    # gather Din-wide raw rows (not the R*Dout-wide transformed ones) and
    # relation-transform locally — R-fold less wire
    halo_x = x.gather(pg.halo_ids, capacity_factor=capacity_factor)
    trans = lambda a: jnp.einsum("nd,rde->nre", a, W).reshape(a.shape[0], R * Dout)
    fn = _build_rgcn_agg_fn(
        pg.mesh, pg.axis, pg.plan.capacity, pg.e_cap, pg.h_cap, R, Dout
    )
    agg = fn(trans(x.data), trans(halo_x), pg.src_slot, pg.dst_slot,
             pg.edge_type)
    out = agg + x.data @ lp["self"]["kernel"]
    if "bias" in lp:
        out = out + lp["bias"]
    return out


def eval_full_graph_partitioned(
    model, params, pg: PartitionedGraph, x_tab: ShardedTable,
    *, capacity_factor: float = 2.0,
) -> ShardedTable:
    """Pod-scale full-graph eval over the halo layout: the
    :func:`models.sharded_eval.eval_full_graph_sharded` pass with every
    per-edge gather+scatter replaced by one halo gather per layer.  Covers
    all four conv stacks: 'sage' (mean), 'gcn', 'gat', 'rgcn'."""
    mt = model.model_type.lower()
    check_input(
        mt in ("sage", "gcn", "gat", "rgcn"),
        f"halo eval supports sage|gcn|gat|rgcn, got {mt}",
    )
    if mt == "sage":
        check_input(model.aggregator == "mean", "halo sage eval: mean only")
    p = params["params"]
    prefix = {"sage": "SAGEConv", "gcn": "GCNConv", "gat": "GATConv",
              "rgcn": "RGCNConv"}[mt]
    x = x_tab
    L = model.num_layers
    if mt == "gcn":
        deg = degrees(pg)
        inv = ShardedTable(
            jax.lax.rsqrt(deg.data + 1.0), deg.plan, pg.mesh, pg.axis
        )
    for i in range(L):
        lp = p[f"{prefix}_{i}"]
        if mt == "sage":
            agg = spmm_halo(pg, x, "mean", capacity_factor=capacity_factor)
            h = jnp.concatenate([x.data, agg.data], axis=-1)
            h = h @ lp["proj"]["kernel"] + lp["proj"]["bias"]
        elif mt == "gcn":
            h = x.data @ lp["proj"]["kernel"]
            hx = ShardedTable(h * inv.data, x.plan, pg.mesh, pg.axis)
            agg = spmm_halo(pg, hx, "sum", capacity_factor=capacity_factor)
            h = (agg.data + hx.data) * inv.data
            if "bias" in lp:
                h = h + lp["bias"]
        elif mt == "gat":
            H = model.num_heads if i < L - 1 else 1
            out_dim = model.num_classes if i == L - 1 else model.hidden_dim
            h = _gat_layer_halo(
                pg, x, lp, H, out_dim // max(H, 1), True, capacity_factor
            )
        else:
            h = _rgcn_layer_halo(pg, x, lp, capacity_factor)
        if i < L - 1:
            h = jax.nn.relu(h)
        x = ShardedTable(h, x.plan, pg.mesh, pg.axis)
    return x

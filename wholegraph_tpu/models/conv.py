"""GNN convolution layers (flax.linen), padded-subgraph + full-graph modes.

TPU-native replacement for the reference's conv-layer integrations
(reference: python torch/cugraphops/sage_conv.py:23-101 CuGraphSAGEConv,
gat_conv.py:22-102 CuGraphGATConv, and the dgl/pyg adapters in
torch/gnn_model.py:25-118).  The reference delegates the sparse math to
cuGraph-Ops fused CUDA kernels; here the sampled path is dense padded
gather+reduce over a static K axis (ops/spmm.py) which XLA fuses with the
projection matmuls onto the MXU.

Every layer accepts either:
* ``HopSubgraph`` — sampled padded adjacency; input x covers the DEEPER
  level's unique nodes, output covers this hop's targets (prefix of x rows);
* ``FullGraph`` — COO edge list for full-graph passes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.structure import HopSubgraph
from ..ops import spmm as S

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FullGraph:
    """COO edges (sorted by dst) over a single node set of static size.

    When built with ``GraphStructure.to_full_graph(windowed=True)`` on a
    locality-ordered CSR, carries the CSR ``row_ptr`` plus a feasible
    ``(window, edge_cap)`` tile plan — sum/mean aggregations then route
    through the fused pallas windowed SpMM (ops/spmm_pallas.spmm_window,
    ~4x the segment-sum path on v5e) instead of gather+segment_sum."""

    edge_src: Array
    edge_dst: Array
    num_nodes: int
    edge_type: Optional[Array] = None
    row_ptr: Optional[Array] = None
    window: Optional[int] = None  # static plan (plan_spmm_tiles), or None
    edge_cap: Optional[int] = None

    def tree_flatten(self):
        return (
            (self.edge_src, self.edge_dst, self.edge_type, self.row_ptr),
            (self.num_nodes, self.window, self.edge_cap),
        )

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], aux[0], ch[2], ch[3], aux[1], aux[2])


Adj = Union[HopSubgraph, FullGraph]


def _fg_spmm(g: "FullGraph", x: Array, reduce: str,
             edge_weight: Optional[Array] = None) -> Array:
    """Full-graph aggregation: fused windowed SpMM when the graph carries a
    feasible tile plan (and the shape qualifies), XLA segment path
    otherwise.  Both are exact; spmm_window's VJP is the exact transposed
    segment SpMM."""
    if (
        _fg_use_windowed(g, x.shape[-1] % 128 == 0)
        and reduce in ("sum", "mean")
        and not (reduce == "mean" and edge_weight is not None)
    ):
        from ..ops.spmm_pallas import spmm_window

        return spmm_window(
            g.row_ptr, g.edge_src, x, window=g.window, edge_cap=g.edge_cap,
            reduce=reduce, edge_weight=edge_weight,
        ).astype(x.dtype)
    return S.spmm(
        g.edge_src, g.edge_dst, x, g.num_nodes, reduce,
        edge_weight=edge_weight,
    )


def _fg_use_windowed(g: "FullGraph", lanes_ok: bool = True) -> bool:
    """Gate for routing a FullGraph op through the windowed pallas kernels:
    needs a feasible tile plan, and off-TPU (interpret mode = a Python grid
    loop) only small graphs (CPU test coverage), never eval-scale."""
    return (
        g.row_ptr is not None
        and g.window is not None
        and lanes_ok
        and (jax.default_backend() == "tpu" or g.num_nodes <= 4096)
    )


def _fg_gat_windowed(
    g: "FullGraph",
    featv: Array,  # [N, H, D] projected per-head features
    e_src_n: Array,  # [N, H] src attention terms
    e_dst_n: Array,  # [N, H] dst attention terms
    *,
    negative_slope: float,
    add_self_loop: bool,
) -> Array:
    """Fused full-graph GAT message passing (mha_gat_n2n analog, reference
    torch/cugraphops/gat_conv.py:73-101): per-edge logits from the CHEAP
    [E, H] attention-term takes (H ~ 4-8 scalars per edge, not D-dim rows),
    edge-softmax through the sorted segment ops, then the heavy per-edge
    D-dim message aggregation through the WEIGHTED windowed SpMM — one
    window slab read per dst tile instead of 2 D-dim row reads per edge.
    Attention gradients flow through spmm_window's dw VJP (= the windowed
    SDDMM on the same tile plan).  Self loops are handled analytically
    (the self logit joins each node's softmax; the self message is an
    elementwise add) so the CSR and its tile plan stay intact."""
    N, H, D = featv.shape
    src, rp = g.edge_src, g.row_ptr
    E = src.shape[0]
    edge_dst = (
        jnp.searchsorted(
            rp, jnp.arange(E, dtype=rp.dtype), side="right"
        ).astype(jnp.int32)
        - 1
    )
    logits = nn.leaky_relu(
        jnp.take(e_src_n, src, axis=0, mode="clip")
        + jnp.take(e_dst_n, edge_dst, axis=0, mode="clip"),
        negative_slope=negative_slope,
    )  # [E, H]
    if add_self_loop:
        l_self = nn.leaky_relu(
            e_src_n + e_dst_n, negative_slope=negative_slope
        )  # [N, H]
        mx = jnp.maximum(
            jax.ops.segment_max(
                logits, edge_dst, num_segments=N, indices_are_sorted=True
            ),
            l_self,
        )
        mx = jax.lax.stop_gradient(mx)
        z = jnp.exp(logits - jnp.take(mx, edge_dst, axis=0, mode="clip"))
        z_self = jnp.exp(l_self - mx)
        den = (
            jax.ops.segment_sum(
                z, edge_dst, num_segments=N, indices_are_sorted=True
            )
            + z_self
        )
        alpha = z / jnp.maximum(
            jnp.take(den, edge_dst, axis=0, mode="clip"), 1e-16
        )
        alpha_self = z_self / jnp.maximum(den, 1e-16)  # [N, H]
    else:
        alpha = jax.vmap(
            lambda lg: S.edge_softmax(edge_dst, lg, N, indices_are_sorted=True),
            in_axes=1,
            out_axes=1,
        )(logits)
        alpha_self = None

    from ..ops.spmm_pallas import spmm_window

    pad_D = -D % 128
    outs = []
    for h in range(H):
        xh = featv[:, h, :]
        if pad_D:
            xh = jnp.pad(xh, ((0, 0), (0, pad_D)))
        oh = spmm_window(
            rp, src, xh, window=g.window, edge_cap=g.edge_cap,
            reduce="sum", edge_weight=alpha[:, h],
            # attention weights are gradient-grade computed values: the
            # split2 A-build (2 bf16 hi+lo passes, ~2^-16 rel) runs ~3x
            # fewer MXU passes than f32-HIGHEST — the GAT fwd's dominant
            # cost (exp_gat_chain: invariant-chain 3.3 s at E=20M was the
            # 4 HIGHEST weighted A-builds)
            weight_precision="split2",
        )
        outs.append(oh[:, :D].astype(featv.dtype))
    out = jnp.stack(outs, axis=1)  # [N, H, D]
    if alpha_self is not None:
        out = out + alpha_self[..., None].astype(featv.dtype) * featv
    return out


def _self_feats(x: Array, g: Adj) -> Array:
    if isinstance(g, HopSubgraph):
        return x[: g.num_targets]
    return x


def _hop_reduce(x: Array, g: HopSubgraph, reduce: str) -> Array:
    """Sampled-block aggregation: the per-run windowed SpMM path when the
    hop carries a windowed plan (MultilayerSample.with_windowed_agg) and
    the shape qualifies, the padded gather+reduce otherwise.  Both exact."""
    if (
        g.run_bounds is not None
        and g.windows is not None
        and reduce in ("sum", "mean")
        and x.ndim == 2
        and x.shape[1] % 128 == 0
        and (jax.default_backend() == "tpu" or x.shape[0] <= 4096)
    ):
        return S.padded_reduce_windowed(
            x, g.nbr_idx, g.mask, reduce,
            run_bounds=g.run_bounds, windows=g.windows,
        ).astype(x.dtype)
    return S.padded_reduce(x, g.nbr_idx, g.mask, reduce)


def _neighbor_mean(x: Array, g: Adj) -> Array:
    if isinstance(g, HopSubgraph):
        return _hop_reduce(x, g, "mean")
    return _fg_spmm(g, x, "mean")


class SAGEConv(nn.Module):
    """GraphSAGE conv: out = act(W_self·x + W_neigh·mean(x_neigh))
    (CuGraphSAGEConv analog, sage_conv.py:73-95: agg_concat_n2n + linear)."""

    out_dim: int
    aggregator: str = "mean"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, g: Adj) -> Array:
        xs = _self_feats(x, g)
        if isinstance(g, HopSubgraph):
            if self.aggregator in ("sum", "mean"):
                xn = _hop_reduce(x, g, self.aggregator)
            else:
                xn = S.padded_reduce(x, g.nbr_idx, g.mask, self.aggregator)
        else:
            xn = _fg_spmm(g, x, self.aggregator)
        # concat[self, neigh] @ W == W_self·x + W_neigh·neigh (reference concat form)
        h = jnp.concatenate([xs, xn], axis=-1)
        return nn.Dense(self.out_dim, use_bias=self.use_bias, name="proj")(h)


class GCNConv(nn.Module):
    """GCN conv, symmetric ``D^-1/2 A D^-1/2`` normalisation with implicit
    self loop.  On a sampled ``HopSubgraph``:

    * ``degree_mode='block'``: degrees are the *block* degrees (dst
      in-degree and src out-degree within the sampled bipartite block, DGL
      GraphConv block semantics) — an approximation of the full-graph
      degrees that converges as fanout covers the neighborhood;
    * ``degree_mode='true'``: TRUE graph degrees from
      ``HopSubgraph.node_degree`` (multilayer_sample(with_degrees=True)) —
      with fanout >= max degree the sampled output matches the full-graph
      pass exactly;
    * ``degree_mode='auto'`` (default): true degrees when the hop carries
      them, block degrees otherwise."""

    out_dim: int
    use_bias: bool = True
    degree_mode: str = "auto"  # auto | block | true

    @nn.compact
    def __call__(self, x: Array, g: Adj) -> Array:
        h = nn.Dense(self.out_dim, use_bias=False, name="proj")(x)
        if isinstance(g, HopSubgraph):
            B = g.num_targets
            if self.degree_mode == "true":
                assert g.node_degree is not None, (
                    "degree_mode='true' needs HopSubgraph.node_degree; "
                    "sample with multilayer_sample(with_degrees=True)"
                )
            use_true = (
                self.degree_mode != "block" and g.node_degree is not None
            )
            if use_true:
                nd = g.node_degree.astype(h.dtype) + 1.0  # + self loop
                inv_src = jax.lax.rsqrt(jnp.maximum(nd, 1.0))
                inv_dst = inv_src[:B]
            else:
                deg_dst = jnp.sum(g.mask, axis=1) + 1  # in-degree + self loop
                # out-degree of each source row within the block (+1 self
                # loop for target rows, which are the prefix of x)
                flat = jnp.where(g.mask, g.nbr_idx, x.shape[0]).reshape(-1)
                deg_src = (
                    jnp.zeros((x.shape[0],), h.dtype)
                    .at[flat]
                    .add(1.0, mode="drop")
                    .at[jnp.arange(B)]
                    .add(1.0)
                )
                inv_src = jax.lax.rsqrt(jnp.maximum(deg_src, 1.0))
                inv_dst = jax.lax.rsqrt(deg_dst.astype(h.dtype))
            agg = _hop_reduce(h * inv_src[:, None], g, "sum")
            out = (agg + (h * inv_src[:, None])[:B]) * inv_dst[:, None]
        else:
            ones = jnp.ones((g.edge_src.shape[0],), h.dtype)
            deg = (
                jax.ops.segment_sum(ones, g.edge_dst, num_segments=g.num_nodes) + 1
            )
            inv = jax.lax.rsqrt(deg)
            agg = _fg_spmm(g, h * inv[:, None], "sum")
            out = (agg + h * inv[:, None]) * inv[:, None]
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return out


class GATConv(nn.Module):
    """Multi-head GAT conv (CuGraphGATConv analog, gat_conv.py:22-102:
    mha_gat_n2n fused SDDMM + edge-softmax + SpMM, here masked padded ops)."""

    out_dim: int  # per-head output dim
    num_heads: int = 1
    negative_slope: float = 0.2
    add_self_loop: bool = True
    concat_heads: bool = True

    @nn.compact
    def __call__(self, x: Array, g: Adj) -> Array:
        H, D = self.num_heads, self.out_dim
        feat = nn.Dense(H * D, use_bias=False, name="proj")(x)
        a_src = self.param("attn_src", nn.initializers.glorot_uniform(), (H, D))
        a_dst = self.param("attn_dst", nn.initializers.glorot_uniform(), (H, D))

        if isinstance(g, HopSubgraph):
            B = g.num_targets
            featv = feat.reshape(-1, H, D)
            e_dst = jnp.einsum("bhd,hd->bh", featv[:B], a_dst)  # [B, H]
            nbr = g.nbr_idx
            mask = g.mask
            if self.add_self_loop:
                self_idx = jnp.arange(B, dtype=nbr.dtype)[:, None]
                nbr = jnp.concatenate([self_idx, nbr], axis=1)
                mask = jnp.concatenate([jnp.ones((B, 1), bool), mask], axis=1)
            nfeat = jnp.take(featv, nbr, axis=0, mode="clip")  # [B, K', H, D]
            e_src = jnp.einsum("bkhd,hd->bkh", nfeat, a_src)
            logits = nn.leaky_relu(
                e_src + e_dst[:, None, :], negative_slope=self.negative_slope
            )
            alpha = S.padded_softmax(logits, mask[..., None] & jnp.ones_like(logits, bool), axis=1)
            out = jnp.sum(alpha[..., None] * nfeat, axis=1)  # [B, H, D]
        else:
            featv = feat.reshape(-1, H, D)
            e_src_n = jnp.einsum("nhd,hd->nh", featv, a_src)
            e_dst_n = jnp.einsum("nhd,hd->nh", featv, a_dst)
            if _fg_use_windowed(g):
                # fused mha_gat_n2n analog: edge-softmax + per-head weighted
                # windowed SpMM; no per-edge D-dim row reads in fwd OR in
                # the attention backward (dw = windowed SDDMM)
                out = _fg_gat_windowed(
                    g, featv, e_src_n, e_dst_n,
                    negative_slope=self.negative_slope,
                    add_self_loop=self.add_self_loop,
                )
            else:
                src, dst = g.edge_src, g.edge_dst
                if self.add_self_loop:
                    loop = jnp.arange(g.num_nodes, dtype=src.dtype)
                    src = jnp.concatenate([src, loop])
                    dst = jnp.concatenate([dst, loop])
                logits = nn.leaky_relu(
                    jnp.take(e_src_n, src, axis=0) + jnp.take(e_dst_n, dst, axis=0),
                    negative_slope=self.negative_slope,
                )  # [E, H]
                alpha = jax.vmap(
                    lambda lg: S.edge_softmax(dst, lg, g.num_nodes, indices_are_sorted=False),
                    in_axes=1,
                    out_axes=1,
                )(logits)
                E_, n_ = src.shape[0], g.num_nodes
                if E_ * H * D > 1 << 28:
                    # full-graph scale: the [E, H, D] message intermediate
                    # (5+ GB at E=5M, H=4, D=64) OOMs a 16 GB chip — run
                    # the aggregation per head in O(chunk x D) memory (the
                    # same chunking the windowed VJP uses)
                    from ..ops.spmm_pallas import _segment_spmm_chunked

                    out = jnp.stack(
                        [
                            _segment_spmm_chunked(
                                featv[:, h, :], src, dst, n_, alpha[:, h]
                            )
                            for h in range(H)
                        ],
                        axis=1,
                    )  # [N, H, D]
                else:
                    msgs = jnp.take(featv, src, axis=0) * alpha[..., None]
                    out = jax.ops.segment_sum(
                        msgs.reshape(E_, H * D), dst, num_segments=n_
                    ).reshape(-1, H, D)
        if self.concat_heads:
            return out.reshape(out.shape[0], H * D)
        return out.mean(axis=1)


class RGCNConv(nn.Module):
    """Relational GCN conv: per-relation mean aggregation + self transform
    (heterogeneous support; the reference's RGCN examples run through DGL —
    gnn_model.py framework adapters)."""

    out_dim: int
    num_relations: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, g: Adj, edge_type: Optional[Array] = None) -> Array:
        R = self.num_relations
        W_rel = self.param(
            "w_rel", nn.initializers.glorot_uniform(), (R, x.shape[-1], self.out_dim)
        )
        if isinstance(g, HopSubgraph):
            et = edge_type  # [B, K]
            assert et is not None, "RGCNConv on a HopSubgraph needs edge_type"
            nfeat = S.padded_gather_neighbors(x, g.nbr_idx)  # [B, K, Din]
            onehot = jax.nn.one_hot(et, R, dtype=x.dtype) * g.mask[..., None]
            cnt = jnp.maximum(jnp.sum(onehot, axis=1), 1)  # [B, R]
            agg = jnp.einsum("bkr,bkd->brd", onehot, nfeat) / cnt[..., None]
            out = jnp.einsum("brd,rde->be", agg, W_rel)
            out = out + nn.Dense(self.out_dim, use_bias=False, name="self")(
                x[: g.num_targets]
            )
        else:
            et = edge_type if edge_type is not None else g.edge_type
            assert et is not None, "RGCNConv on a FullGraph needs edge_type"
            h = jnp.einsum("nd,rde->nre", x, W_rel)  # [N, R, Dout]
            msgs = jnp.take_along_axis(
                jnp.take(h, g.edge_src, axis=0), et[:, None, None], axis=1
            )[:, 0]
            seg = g.edge_dst * R + et
            summed = jax.ops.segment_sum(
                msgs, seg, num_segments=g.num_nodes * R, indices_are_sorted=False
            ).reshape(g.num_nodes, R, self.out_dim)
            cnt = jax.ops.segment_sum(
                jnp.ones_like(seg, x.dtype), seg, num_segments=g.num_nodes * R,
                indices_are_sorted=False,
            ).reshape(g.num_nodes, R, 1)
            out = jnp.sum(summed / jnp.maximum(cnt, 1), axis=1)
            out = out + nn.Dense(self.out_dim, use_bias=False, name="self")(x)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return out

"""Graph structure + multi-layer mini-batch sampling.

TPU-native analog of the reference's GraphStructure
(reference: python torch/graph_structure.py:21-196 —
``multilayer_sample_without_replacement`` composes one-hop sampling +
append_unique per layer).

Key shape discipline (XLA static shapes): every hop's output is padded.
Layer l has ``num_targets[l] = B * prod_{i<l}(K_i + 1)`` target slots, each
either a valid node or padding.  ``append_unique`` keeps targets as a prefix
of the next level's unique list, so the unique node sets NEST:
``unique_l == unique_{l+1}[:U_l]``.  Models exploit this: activations for
level l+1's unique set directly provide the self-features of level l's
targets (no re-indexing).

Padding targets are given distinct dummy ids ``>= node_count`` so uniquing
keeps their slots without colliding with real nodes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph_ops import append_unique
from ..ops.sampling import SampleResult, TableLike, csr_sample_neighbors

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class HopSubgraph:
    """One sampled hop, in padded relabeled form.

    nbr_idx: [B_l, K] neighbor positions within the NEXT level's unique list.
    mask:    [B_l, K] edge validity.
    center_mask: [B_l] target-slot validity.
    """

    nbr_idx: Array
    mask: Array
    center_mask: Array
    edge_type: Optional[Array] = None  # [B_l, K] relation ids (RGCN)
    # TRUE graph degrees (row_ptr diffs) of the NEXT level's unique nodes
    # (= this hop's x rows; targets are the prefix).  Padding slots hold 0.
    # Populated by multilayer_sample(with_degrees=True); GCNConv uses these
    # for exact D^-1/2 A D^-1/2 normalisation instead of block degrees.
    node_degree: Optional[Array] = None
    # STATIC windowed-aggregation plan (MultilayerSample.with_windowed_agg):
    # unique-list run boundaries + per-run window sizes; conv layers then
    # route sum/mean padded reduces through padded_reduce_windowed.
    run_bounds: Optional[tuple] = None
    windows: Optional[tuple] = None

    def tree_flatten(self):
        return (
            self.nbr_idx, self.mask, self.center_mask, self.edge_type,
            self.node_degree,
        ), (self.run_bounds, self.windows)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, run_bounds=aux[0], windows=aux[1])

    @property
    def num_targets(self) -> int:
        return self.nbr_idx.shape[0]

    @property
    def fanout(self) -> int:
        return self.nbr_idx.shape[1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MultilayerSample:
    """Result of multi-layer sampling.

    hops[l] relabels level-l targets against level-(l+1) uniques;
    unique_gids/unique_mask describe the DEEPEST level's unique node set —
    gather input features for exactly these (padding slots → id 0, masked).
    """

    hops: List[HopSubgraph]
    unique_gids: Array
    unique_mask: Array
    level_gids: List[Array] = dataclasses.field(default_factory=list)
    level_masks: List[Array] = dataclasses.field(default_factory=list)

    def tree_flatten(self):
        return (
            tuple(self.hops),
            self.unique_gids,
            self.unique_mask,
            tuple(self.level_gids),
            tuple(self.level_masks),
        ), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        hops, gids, mask, lg, lm = ch
        return cls(list(hops), gids, mask, list(lg), list(lm))

    def run_bounds(self, level: int) -> tuple:
        """Static unique-list run boundaries for the hop-``level`` block
        (whose x rows are ``level_gids[level+1]``): each level's unique
        list is [previous level's list | NEW ids sorted ascending]
        (append_unique), so the boundaries are simply the level buffer
        sizes — input to :func:`ops.spmm.padded_reduce_windowed`."""
        return (0,) + tuple(
            int(g.shape[0]) for g in self.level_gids[: level + 2]
        )

    def with_windowed_agg(self, windows=2048) -> "MultilayerSample":
        """Annotate every hop with its windowed-aggregation plan (static
        run boundaries + per-run window sizes): conv layers then route
        sum/mean padded reduces through the per-run windowed SpMM
        (:func:`ops.spmm.padded_reduce_windowed`) — profitable on
        locality-ordered graphs, exact on any (out-of-window edges repair
        through the residual).  ``windows``: int (same for every run) or
        per-hop tuple of per-run tuples."""
        hops = []
        for l, h in enumerate(self.hops):
            rb = self.run_bounds(l)
            if isinstance(windows, int):
                w = tuple(min(-(-min(b2 - b1, windows) // 128) * 128,
                              windows) for b1, b2 in zip(rb, rb[1:]))
            else:
                w = tuple(windows[l])
            hops.append(dataclasses.replace(h, run_bounds=rb, windows=w))
        return dataclasses.replace(self, hops=hops)


@dataclasses.dataclass
class GraphStructure:
    """CSR graph whose arrays may be replicated jnp arrays or ShardedTables
    (torch/graph_structure.py:21 analog; set_csr_graph + attributes)."""

    row_ptr: TableLike  # [N+1]
    col: TableLike  # [E]
    node_count: int
    edge_count: int
    max_degree: int
    edge_weight: Optional[TableLike] = None
    edge_type: Optional[TableLike] = None  # [E] relation ids (RGCN)
    num_relations: int = 0
    # precomputed interleave_col_weights(col, edge_weight) pair-block table
    # ([ceil(E/128), 256] int32): one block DMA then serves both the A-Res
    # keys and the selected neighbor values (see with_weighted_fastpath)
    cw_blocks: Optional[Array] = None

    def with_weighted_fastpath(self) -> "GraphStructure":
        """Return a copy carrying the fused weighted-sampling pair-block
        table (costs E x 8 B of extra device memory; weighted sampling then
        skips its separate col-block fetch — bit-equal, ~25% faster steps
        measured r4).  Requires replicated (non-sharded) col/edge_weight."""
        from ..ops.sampling import interleave_col_weights
        from ..utils.error import check_input

        check_input(self.edge_weight is not None,
                    "with_weighted_fastpath needs edge_weight")
        check_input(
            not hasattr(self.col, "gather")
            and not hasattr(self.edge_weight, "gather"),
            "weighted fastpath needs replicated col/edge_weight",
        )
        return dataclasses.replace(
            self,
            cw_blocks=interleave_col_weights(
                jnp.asarray(self.col), jnp.asarray(self.edge_weight)
            ),
        )

    @staticmethod
    def from_coo(
        src: np.ndarray,
        dst: np.ndarray,
        node_count: int,
        *,
        edge_weight: Optional[np.ndarray] = None,
        edge_type: Optional[np.ndarray] = None,
        num_relations: int = 0,
        add_reverse: bool = False,
    ) -> "GraphStructure":
        """Host-side CSR build from a COO edge list (sorted by src)."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if add_reverse:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            if edge_weight is not None:
                edge_weight = np.concatenate([edge_weight, edge_weight])
            if edge_type is not None:
                edge_type = np.concatenate([edge_type, edge_type])
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        if edge_weight is not None:
            edge_weight = np.asarray(edge_weight)[order]
        if edge_type is not None:
            edge_type = np.asarray(edge_type)[order]
            if not num_relations:
                num_relations = int(edge_type.max()) + 1
        counts = np.bincount(src, minlength=node_count)
        row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return GraphStructure(
            row_ptr=jnp.asarray(row_ptr, jnp.int32),
            col=jnp.asarray(dst, jnp.int32),
            node_count=node_count,
            edge_count=len(dst),
            max_degree=int(counts.max()) if node_count else 0,
            edge_weight=None if edge_weight is None else jnp.asarray(edge_weight, jnp.float32),
            edge_type=None if edge_type is None else jnp.asarray(edge_type, jnp.int32),
            num_relations=num_relations,
        )

    def to_full_graph(self, *, windowed: bool = False, tile: int = 256):
        """COO view for exact full-graph passes: messages flow col→row, edges
        already grouped by destination (CSR order).  Returns a FullGraph for
        models.conv layers.

        The dst expansion runs on device (searchsorted over row_ptr — O(E
        log N) on the VPU instead of a host np.repeat materialisation), so
        eval-scale graphs never round-trip E-sized buffers through numpy.

        ``windowed=True`` additionally computes a :func:`ops.spmm.
        plan_spmm_tiles` plan (one host O(E) pass) and, when FEASIBLE —
        i.e. the CSR is locality-ordered so every ``tile``-row span of
        destinations reads a bounded source window — attaches it so
        sum/mean conv aggregations route through the fused pallas windowed
        SpMM (~4x the segment path on v5e).  Infeasible plans silently fall
        back to the plain COO view (exactness is never at stake)."""
        from ..models.conv import FullGraph

        rp = (
            jnp.asarray(self.row_ptr.to_array())
            if hasattr(self.row_ptr, "to_array")
            else jnp.asarray(self.row_ptr)
        )
        # edge e belongs to the row whose ptr range contains it
        edge_dst = (
            jnp.searchsorted(
                rp, jnp.arange(self.edge_count, dtype=rp.dtype), side="right"
            ).astype(jnp.int32)
            - 1
        )
        edge_src = (
            jnp.asarray(self.col)
            if not hasattr(self.col, "to_array")
            else jnp.asarray(self.col.to_array())
        )
        row_ptr = window = edge_cap = None
        if windowed:
            from ..ops.spmm import plan_spmm_tiles

            w, cap, feasible = plan_spmm_tiles(
                np.asarray(rp), np.asarray(edge_src), tile=tile
            )
            if feasible:
                row_ptr, window, edge_cap = rp.astype(jnp.int32), int(w), int(cap)
        return FullGraph(
            edge_src=edge_src,
            edge_dst=edge_dst,
            num_nodes=self.node_count,
            edge_type=jnp.asarray(self.edge_type)
            if self.edge_type is not None and not hasattr(self.edge_type, "to_array")
            else None,
            row_ptr=row_ptr,
            window=window,
            edge_cap=edge_cap,
        )

    # -- sampling -------------------------------------------------------------

    def sample_one_hop(
        self,
        centers: Array,
        max_sample: int,
        *,
        seed: int = 0,
        hop: int = 0,
        weighted: bool = False,
        gather_kwargs: Optional[dict] = None,
    ) -> SampleResult:
        """unweighted/weighted_sample_without_replacement_one_hop analog
        (graph_structure.py:77-138)."""
        return csr_sample_neighbors(
            self.row_ptr,
            self.col,
            centers,
            max_sample,
            seed=seed,
            hop=hop,
            weights=self.edge_weight if weighted else None,
            max_degree=self.max_degree,
            gather_kwargs=gather_kwargs,
            cw_blocks=self.cw_blocks if weighted else None,
        )

    def multilayer_sample(
        self,
        centers: Array,
        fanouts: Sequence[int],
        *,
        seed: int = 0,
        weighted: bool = False,
        center_mask: Optional[Array] = None,
        gather_kwargs: Optional[dict] = None,
        with_degrees: bool = False,
    ) -> MultilayerSample:
        """multilayer_sample_without_replacement analog
        (graph_structure.py:140-196): per layer sample + append_unique,
        producing nested padded subgraphs.

        ``with_degrees=True`` additionally fetches the TRUE graph degree
        (row_ptr diff) of every unique node per level and stores it on each
        hop (``HopSubgraph.node_degree``) — one extra element-gather per
        layer — enabling exact GCN normalisation on sampled blocks."""
        n = self.node_count
        gids = centers.astype(jnp.int32)
        gmask = (
            jnp.ones(gids.shape, bool) if center_mask is None else center_mask
        )
        hops: List[HopSubgraph] = []
        level_gids = [gids]
        level_masks = [gmask]
        for l, K in enumerate(fanouts):
            U = gids.shape[0]
            res = self.sample_one_hop(
                jnp.where(gmask, gids, 0),
                K,
                seed=seed,
                hop=l,
                weighted=weighted,
                gather_kwargs=gather_kwargs,
            )
            emask = res.mask & gmask[:, None]
            # distinct dummy ids for padding targets keep their slots unique
            tgt = jnp.where(gmask, gids, n + jnp.arange(U, dtype=jnp.int32))
            nbrs = jnp.where(emask, res.neighbors, 0).reshape(-1)
            uids, _, nmap = append_unique(tgt, nbrs, emask.reshape(-1))
            etypes = None
            if self.edge_type is not None:
                from ..ops.sampling import _fetch

                flat_eids = jnp.where(emask, res.edge_ids, 0).reshape(-1)
                etypes = (
                    _fetch(self.edge_type, flat_eids, **(gather_kwargs or {}))
                    .reshape(U, K)
                    .astype(jnp.int32)
                )
                etypes = jnp.where(emask, etypes, 0)
            next_mask = (uids >= 0) & (uids < n)
            node_degree = None
            if with_degrees:
                from ..ops.sampling import _fetch_ptr_pairs

                safe = jnp.where(next_mask, uids, 0).astype(jnp.int32)
                d0, d1 = _fetch_ptr_pairs(
                    self.row_ptr, safe, **(gather_kwargs or {})
                )
                node_degree = jnp.where(
                    next_mask, (d1 - d0).astype(jnp.int32), 0
                )
            hops.append(
                HopSubgraph(
                    nbr_idx=jnp.where(emask, nmap.reshape(U, K), 0),
                    mask=emask,
                    center_mask=gmask,
                    edge_type=etypes,
                    node_degree=node_degree,
                )
            )
            gmask = next_mask
            # padding -> the OOB sentinel n: distributed gathers serve OOB
            # ids as zero rows WITHOUT exchanging them (in_range filter), so
            # the worst-case-sized unique buffer's padded tail costs no
            # wire/bucket volume (padding at id 0 flooded owner 0's bucket
            # with phantom requests — measured 100K+ probe overflow on a
            # 512-center batch); apply_gradients' mask= keeps optimizer
            # state untouched either way, and replicated-array consumers
            # clip + mask.
            gids = jnp.where(gmask, uids, n)
            level_gids.append(gids)
            level_masks.append(gmask)
        return MultilayerSample(
            hops=hops,
            unique_gids=gids,
            unique_mask=gmask,
            level_gids=level_gids,
            level_masks=level_masks,
        )

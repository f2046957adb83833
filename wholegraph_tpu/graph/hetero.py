"""Typed node feature spaces (heterogeneous nodes).

MAG240M-style graphs carry several NODE types (paper/author/institution)
with per-type feature tables of different widths.  The reference handles
typed EDGES through its RGCN examples but has no typed node store; this
module extends the sharded feature machinery to per-type tables under one
unified global id space (reference context: the homogeneous embedding
store, cpp/src/wholememory_embedding.cpp + python torch/embedding.py).

TPU-first design (static shapes throughout):

* Global ids are OFFSET-PARTITIONED by type (the OGB hetero convention):
  ``gid = offset[type] + local_id``.  Type/local decomposition is pure
  traced index math (searchsorted over the static offset table).
* A mixed-type batch gathers from EVERY type's table with the full batch,
  masked to that type's slots (off-type slots fetch row 0 and are zeroed).
  For the 2-4 node types of real hetero graphs this costs T masked
  gathers — each an exact multi-round a2a — instead of dynamic
  compaction, which XLA cannot shape.
* Per-type widths are reconciled by :class:`TypedProjection` (flax):
  ``out = sum_t mask_t * (rows_t @ W_t + b_t)`` — the projection weights
  are model parameters, so the whole path is differentiable end-to-end
  and trainable stores update per type via each Embedding's exact
  apply_gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..embedding.embedding import Embedding, EmbeddingState
from ..embedding.optimizers import SparseOptimizer
from ..utils.error import check_input

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NodeTypeSpace:
    """Static type layout: names, row counts, feature dims, id offsets."""

    names: tuple
    counts: tuple
    dims: tuple

    @staticmethod
    def create(counts: Dict[str, int], dims: Dict[str, int]) -> "NodeTypeSpace":
        names = tuple(counts)
        check_input(set(dims) == set(names), "dims/counts type mismatch")
        return NodeTypeSpace(
            names=names,
            counts=tuple(int(counts[n]) for n in names),
            dims=tuple(int(dims[n]) for n in names),
        )

    @property
    def offsets(self) -> np.ndarray:
        """offsets[t] = first global id of type t; offsets[-1] = total."""
        return np.concatenate([[0], np.cumsum(self.counts)]).astype(np.int64)

    @property
    def total(self) -> int:
        return int(sum(self.counts))

    def type_of(self, gids: Array) -> Array:
        """Type index per global id (OOB ids map to the last type; callers
        mask).  Pure traced math over the static offset table."""
        offs = jnp.asarray(self.offsets[1:-1], gids.dtype)
        return jnp.searchsorted(offs, gids, side="right").astype(jnp.int32)

    def local_of(self, gids: Array) -> Array:
        t = self.type_of(gids)
        offs = jnp.asarray(self.offsets[:-1], gids.dtype)
        return gids - jnp.take(offs, t, mode="clip")

    def global_of(self, name: str, local_ids: Array) -> Array:
        i = self.names.index(name)
        return local_ids + jnp.asarray(self.offsets[i], local_ids.dtype)


@dataclasses.dataclass(frozen=True)
class HeteroFeatureStore:
    """One sharded (optionally trainable) Embedding per node type."""

    space: NodeTypeSpace
    embeddings: Dict[str, Embedding]

    @staticmethod
    def create(
        mesh,
        space: NodeTypeSpace,
        *,
        optimizer: Optional[SparseOptimizer] = None,
        dtype=jnp.float32,
        axis: str = "data",
    ) -> "HeteroFeatureStore":
        embs = {
            n: Embedding.create(
                mesh, c, d, optimizer=optimizer, dtype=dtype, axis=axis
            )
            for n, c, d in zip(space.names, space.counts, space.dims)
        }
        return HeteroFeatureStore(space, embs)

    def init(self, key) -> Dict[str, EmbeddingState]:
        keys = jax.random.split(key, len(self.space.names))
        return {
            n: self.embeddings[n].init(k)
            for n, k in zip(self.space.names, keys)
        }

    def from_arrays(self, arrays: Dict[str, np.ndarray]) -> Dict[str, EmbeddingState]:
        check_input(set(arrays) == set(self.space.names), "array/type mismatch")
        return {n: self.embeddings[n].from_array(arrays[n]) for n in self.space.names}

    def gather_typed(
        self, states: Dict[str, EmbeddingState], gids: Array, **kw
    ):
        """rows_by_type (each [B, dim_t], zero on off-type slots) +
        masks_by_type ([B] bool).  Differentiable: grads flow into each
        type's table through its own exact gather."""
        t = self.space.type_of(gids)
        loc = self.space.local_of(gids)
        rows, masks = {}, {}
        for i, n in enumerate(self.space.names):
            m = (t == i) & (gids >= 0) & (gids < self.space.total)
            ids_n = jnp.where(m, loc, 0).astype(jnp.int32)
            r = self.embeddings[n].gather(states[n], ids_n, **kw)
            rows[n] = jnp.where(m[:, None], r, 0)
            masks[n] = m
        return rows, masks

    def apply_gradients(
        self,
        states: Dict[str, EmbeddingState],
        gids: Array,
        grads_by_type: Dict[str, Array],
        lr,
        *,
        mask: Optional[Array] = None,
        **kw,
    ) -> Dict[str, EmbeddingState]:
        """Per-type sparse update; off-type / padding slots excluded via
        each type's mask (row 0's optimizer state stays untouched — the
        sampler-padding invariant)."""
        t = self.space.type_of(gids)
        loc = self.space.local_of(gids)
        out = {}
        for i, n in enumerate(self.space.names):
            m = (t == i) & (gids >= 0) & (gids < self.space.total)
            if mask is not None:
                m = m & mask
            ids_n = jnp.where(m, loc, 0).astype(jnp.int32)
            out[n] = self.embeddings[n].apply_gradients(
                states[n], ids_n, grads_by_type[n], lr, mask=m, **kw
            )
        return out


# ---------------------------------------------------------------------------
# Typed-edge graph construction + a synthetic MAG240M-style task
# ---------------------------------------------------------------------------


def build_hetero_graph(
    space: NodeTypeSpace,
    edges: Dict[tuple, tuple],
    *,
    add_reverse_relations: bool = False,
):
    """Build one unified :class:`~wholegraph_tpu.graph.GraphStructure` from
    per-relation typed edge lists — the MAG240M/OGB hetero convention
    (reference context: the RGCN examples delegate this layout to DGL; here
    it is first-class).

    ``edges`` maps ``(src_type, relation_name, dst_type)`` to
    ``(src_local_ids, dst_local_ids)`` numpy arrays.  Local ids are lifted
    into the unified offset-partitioned id space and each relation gets a
    dense relation id (iteration order of ``edges``).  With
    ``add_reverse_relations`` every relation ``r`` also emits a distinct
    reverse relation (id ``len(edges)+r``) with src/dst swapped — the
    standard R-GCN message-passing symmetrisation.

    Returns ``(graph, relation_names)`` where ``graph.edge_type`` holds the
    per-edge relation ids and ``relation_names`` the id→name list.
    """
    from .structure import GraphStructure

    srcs, dsts, rels = [], [], []
    names = []
    for rid, ((st, rname, dt), (s_loc, d_loc)) in enumerate(edges.items()):
        si = space.names.index(st)
        di = space.names.index(dt)
        s = np.asarray(s_loc, np.int64) + space.offsets[si]
        d = np.asarray(d_loc, np.int64) + space.offsets[di]
        s_arr = np.asarray(s_loc)
        d_arr = np.asarray(d_loc)
        check_input(
            len(s_arr) == len(d_arr),
            f"relation {rname}: src/dst length mismatch "
            f"({len(s_arr)} vs {len(d_arr)})",
        )
        check_input(
            (s_arr >= 0).all()
            and (d_arr >= 0).all()
            and (s_arr < space.counts[si]).all()
            and (d_arr < space.counts[di]).all(),
            f"relation {rname}: local ids out of range",
        )
        srcs.append(s)
        dsts.append(d)
        rels.append(np.full(len(s), rid, np.int64))
        names.append(rname)
    R = len(names)
    if add_reverse_relations:
        for rid in range(R):
            srcs.append(dsts[rid])
            dsts.append(srcs[rid])
            rels.append(np.full(len(srcs[rid]), R + rid, np.int64))
            names.append(f"rev_{names[rid]}")
    g = GraphStructure.from_coo(
        np.concatenate(srcs),
        np.concatenate(dsts),
        space.total,
        edge_type=np.concatenate(rels),
        num_relations=len(names),
    )
    return g, names


def synthetic_hetero_dataset(
    n_paper: int = 4000,
    n_author: int = 1500,
    n_inst: int = 200,
    num_classes: int = 8,
    dims: Optional[Dict[str, int]] = None,
    papers_per_author: int = 4,
    cites_per_paper: int = 8,
    homophily: float = 0.8,
    seed: int = 0,
):
    """Miniature MAG240M-shaped task for offline end-to-end runs: papers
    carry class labels, cite same-class papers with prob ``homophily``;
    authors write papers drawn mostly from one class pool; institutions
    aggregate authors.  Feature signal is split across TYPES (papers carry
    a weak class signal, authors a strong one) so a typed model must use
    both the projection and the relational structure.

    Returns a dict: space, features (per-type arrays), graph (unified
    GraphStructure with relation-typed edges), relation names, paper
    labels, and train/valid/test splits of paper LOCAL ids.
    """
    rs = np.random.RandomState(seed)
    dims = dims or {"paper": 48, "author": 32, "inst": 16}
    space = NodeTypeSpace.create(
        counts={"paper": n_paper, "author": n_author, "inst": n_inst},
        dims=dims,
    )
    labels = rs.randint(0, num_classes, n_paper)
    pools = [np.where(labels == c)[0] for c in range(num_classes)]
    pools = [p if len(p) else np.array([0]) for p in pools]

    # citations: homophilous paper->paper
    src_p = np.repeat(np.arange(n_paper), cites_per_paper)
    same = rs.rand(len(src_p)) < homophily
    dst_p = rs.randint(0, n_paper, len(src_p))
    for c in range(num_classes):
        m = same & (labels[src_p] == c)
        dst_p[m] = pools[c][rs.randint(0, len(pools[c]), m.sum())]

    # authors: each has a home class and writes papers mostly from its pool
    author_class = rs.randint(0, num_classes, n_author)
    a_src = np.repeat(np.arange(n_author), papers_per_author)
    own = rs.rand(len(a_src)) < homophily
    a_dst = rs.randint(0, n_paper, len(a_src))
    for c in range(num_classes):
        m = own & (author_class[a_src] == c)
        a_dst[m] = pools[c][rs.randint(0, len(pools[c]), m.sum())]

    # affiliations: author -> institution
    i_src = np.arange(n_author)
    i_dst = rs.randint(0, n_inst, n_author)

    graph, rel_names = build_hetero_graph(
        space,
        {
            ("paper", "cites", "paper"): (src_p, dst_p),
            ("author", "writes", "paper"): (a_src, a_dst),
            ("author", "affiliated", "inst"): (i_src, i_dst),
        },
        add_reverse_relations=True,
    )

    def class_signal(cls, dim, scale):
        sig = np.zeros((len(cls), dim), np.float32)
        sig[np.arange(len(cls)), np.asarray(cls) % dim] = scale
        return sig

    features = {
        "paper": (
            class_signal(labels, dims["paper"], 0.8)
            + rs.randn(n_paper, dims["paper"]).astype(np.float32)
        ),
        "author": (
            class_signal(author_class, dims["author"], 2.0)
            + 0.5 * rs.randn(n_author, dims["author"]).astype(np.float32)
        ),
        "inst": rs.randn(n_inst, dims["inst"]).astype(np.float32) * 0.1,
    }

    perm = rs.permutation(n_paper)
    n_tr = int(n_paper * 0.6)
    n_va = int(n_paper * 0.2)
    return {
        "space": space,
        "features": features,
        "graph": graph,
        "relations": rel_names,
        "labels": labels,
        "train": perm[:n_tr],
        "valid": perm[n_tr : n_tr + n_va],
        "test": perm[n_tr + n_va :],
    }

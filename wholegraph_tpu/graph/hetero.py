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

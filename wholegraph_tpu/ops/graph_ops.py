"""Graph utility ops: append-unique relabeling, self-loop insertion, padded↔CSR.

TPU-native replacement for the reference's graph_ops
(reference: cpp/src/graph_ops/append_unique*, csr_add_self_loop_impl.cu,
public API cpp/include/wholegraph/graph_op.h:38-59).  The reference builds the
unique set with a GPU open-addressing hash (AppendUniqueHash,
append_unique_func.cuh:35-143); sort-based uniquing is the idiomatic XLA
equivalent (static shapes, runs on the VPU) and produces the same contract:
targets keep positions 0..T-1 in order, new neighbor ids follow (here in
ascending id order, deterministic), plus a raw-neighbor → unique-index map.

Padded [B, K]+mask is the framework's native sampled-adjacency format; the
compacted-CSR converters recover the reference's output format.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_SENTINEL = int(jnp.iinfo(jnp.int32).max)  # plain int: no device array at import


def append_unique(targets: Array, neighbors: Array, neighbor_mask: Array):
    """Unique(targets ∪ neighbors) with targets first (graph_append_unique
    analog, graph_op.h:38-44).

    Args:
      targets: [T] unique target node ids (the sampling centers).
      neighbors: [M] neighbor node ids (typically the flattened padded [B,K]).
      neighbor_mask: [M] validity of each neighbor slot.

    Returns:
      unique_ids: [T+M] padded unique id list; entries past ``unique_count``
        are -1.  unique_ids[:T] == targets.
      unique_count: scalar int32, number of valid unique ids.
      neighbor_map: [M] index of each neighbor within unique_ids (-1 where
        masked) — the raw→unique relabel map.
    """
    T = targets.shape[0]
    M = neighbors.shape[0]
    bound = T + M

    tgt = targets.astype(jnp.int32)
    nbr = jnp.where(neighbor_mask, neighbors.astype(jnp.int32), _SENTINEL)
    arr = jnp.concatenate([tgt, nbr])
    is_tgt = jnp.concatenate(
        [jnp.ones((T,), jnp.int32), jnp.zeros((M,), jnp.int32)]
    )

    # sort by (id, target-first).  The key is built in uint32 — ids are
    # non-negative int32, so ``id << 1 | bit`` fits exactly in 32 unsigned
    # bits (the int32-max sentinel maps to 0xFFFFFFFF and sorts last); an
    # int32/int64 key would overflow/truncate here with jax x64 disabled.
    key = (arr.astype(jnp.uint32) << 1) | (1 - is_tgt).astype(jnp.uint32)
    order = jnp.argsort(key)
    sid = arr[order]
    stgt = is_tgt[order]
    spos = order  # position in the concat array

    leader = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    leader = leader & (sid < _SENTINEL)
    seg = jnp.maximum(jnp.cumsum(leader) - 1, 0)

    grp_has_tgt = jax.ops.segment_max(stgt, seg, num_segments=bound)
    grp_tpos = jax.ops.segment_max(
        jnp.where(stgt == 1, spos.astype(jnp.int32), -1), seg, num_segments=bound
    )
    has_tgt_elem = grp_has_tgt[seg] > 0

    # rank new (non-target) groups in ascending id order after the targets
    leader_nt = leader & ~has_tgt_elem
    nt_rank_elem = jnp.cumsum(leader_nt.astype(jnp.int32)) - 1
    grp_nt_rank = jax.ops.segment_max(
        jnp.where(leader_nt, nt_rank_elem, -1), seg, num_segments=bound
    )

    grp_out_pos = jnp.where(grp_has_tgt > 0, grp_tpos, T + grp_nt_rank)
    out_pos_elem = grp_out_pos[seg].astype(jnp.int32)

    # unique id list
    unique_ids = jnp.full((bound,), -1, jnp.int32)
    scatter_pos = jnp.where(leader, out_pos_elem, bound)
    unique_ids = unique_ids.at[scatter_pos].set(sid.astype(jnp.int32), mode="drop")
    unique_count = (T + jnp.sum(leader_nt)).astype(jnp.int32)

    # raw→unique map back in input order
    pos_concat = jnp.zeros((bound,), jnp.int32).at[spos].set(out_pos_elem)
    neighbor_map = jnp.where(neighbor_mask, pos_concat[T:], -1)
    return unique_ids, unique_count, neighbor_map


# ---------------------------------------------------------------------------
# Padded ↔ compacted CSR
# ---------------------------------------------------------------------------


def padded_to_csr(neighbors: Array, mask: Array) -> Tuple[Array, Array, Array]:
    """Compact a padded [B, K] adjacency into CSR (row_ptr [B+1], col [B*K]
    left-packed, entries past row_ptr[B] are -1)."""
    B, K = neighbors.shape
    counts = jnp.sum(mask.astype(jnp.int32), axis=1)
    row_ptr = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    pos = row_ptr[:-1][:, None] + rank
    pos = jnp.where(mask, pos, B * K)
    col = jnp.full((B * K,), -1, jnp.int32)
    col = col.at[pos.reshape(-1)].set(neighbors.reshape(-1).astype(jnp.int32), mode="drop")
    return row_ptr, col, row_ptr[-1]


def csr_add_self_loop(row_ptr: Array, col: Array, num_edges: int | None = None):
    """Insert a self edge at the head of every row (csr_add_self_loop analog,
    graph_op.h:55-59).  ``col`` holds local node indices 0..B-1; output col has
    static size E+B."""
    B = row_ptr.shape[0] - 1
    E = col.shape[0]
    new_row_ptr = row_ptr + jnp.arange(B + 1, dtype=row_ptr.dtype)
    # row of each (possibly padded) edge slot
    edge_pos = jnp.arange(E, dtype=jnp.int32)
    row_of = jnp.searchsorted(row_ptr, edge_pos, side="right").astype(jnp.int32) - 1
    valid = edge_pos < row_ptr[-1]
    new_pos = jnp.where(valid, edge_pos + row_of + 1, E + B)
    out = jnp.full((E + B,), -1, col.dtype)
    out = out.at[new_pos].set(col, mode="drop")
    # self loops at each row head
    out = out.at[new_row_ptr[:-1]].set(jnp.arange(B, dtype=col.dtype), mode="drop")
    return new_row_ptr, out


def add_self_loop_padded(neighbors: Array, mask: Array, self_ids: Array):
    """Padded-format self-loop insertion: returns [B, K+1] with the center
    itself in slot 0."""
    nbrs = jnp.concatenate([self_ids[:, None].astype(neighbors.dtype), neighbors], axis=1)
    m = jnp.concatenate([jnp.ones((mask.shape[0], 1), bool), mask], axis=1)
    return nbrs, m

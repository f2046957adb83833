"""Sparse aggregation primitives: SpMM / SDDMM and padded-neighborhood reduce.

TPU-native replacement for the cuGraph-Ops fused aggregation kernels the
reference delegates message passing to (reference:
python torch/cugraphops/sage_conv.py:73-95 ``agg_concat_n2n`` fused
SpMM+concat, gat_conv.py ``mha_gat_n2n`` fused SDDMM+softmax+SpMM).

Two regimes, both XLA-friendly:

* **Padded regime** (sampled mini-batches): adjacency is ``[B, K]`` neighbor
  indices + mask.  Aggregation = dense gather + masked reduce over the static
  K axis — no scatter at all, fuses into the following matmul.  This is the
  hot path for GraphSAGE/GAT training and maps directly onto the VPU/MXU.
* **Edge-list regime** (full graph): COO edges sorted by destination;
  aggregation via ``jax.ops.segment_sum`` (sorted scatter-add).  Used for
  full-graph GCN/analysis passes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Padded neighborhood reduce (sampled path)
# ---------------------------------------------------------------------------


def padded_gather_neighbors(x: Array, nbr_idx: Array) -> Array:
    """x: [U, D] node features; nbr_idx: [B, K] → [B, K, D].

    Routed through local_take so large batches use the Pallas DMA-ring
    gather on TPU (ops/gather_pallas.py) instead of XLA's serialized take."""
    from .gather import local_take

    B, K = nbr_idx.shape
    return local_take(x, nbr_idx.reshape(-1)).reshape(B, K, -1)


def padded_reduce(
    x: Array,
    nbr_idx: Array,
    mask: Array,
    reduce: str = "mean",
) -> Array:
    """Aggregate neighbor features over the padded K axis.

    x: [U, D], nbr_idx/mask: [B, K] → [B, D].
    """
    B, K = nbr_idx.shape
    if (
        reduce in ("sum", "mean")
        and jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.shape[1] % 128 == 0
        and B * K >= 4096
    ):
        # gather in the native [*, d0, 128] tile layout, reduce over K.
        # Measured on v5e: this UNFUSED form (96 Medges/s @ D=256) beats
        # every fused DMA-into-VMEM-accumulator variant (45/77/84 Medges/s,
        # ops/spmm_pallas.py + scripts/exp_spmm_diag.py): row fetches are
        # descriptor-bound (~8 ns HBM→HBM), so the extra HBM passes of the
        # unfused reduce are nearly free, while HBM→VMEM row DMAs plus
        # per-tile scalar↔vector synchronisation run slower per row.
        from .gather_pallas import gather_rows_pallas3

        D = x.shape[1]
        flat = jnp.clip(nbr_idx.reshape(-1).astype(jnp.int32), 0, x.shape[0] - 1)
        pad = -flat.shape[0] % 1024
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        neigh3 = gather_rows_pallas3(x, flat)[: B * K]
        neigh3 = neigh3.reshape(B, K, D // 128, 128)
        m3 = mask[:, :, None, None]
        s = jnp.sum(jnp.where(m3, neigh3, 0), axis=1)  # [B, d0, 128]
        if reduce == "mean":
            cnt = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(x.dtype)
            s = s / cnt[:, None, None]
        return s.reshape(B, D)

    neigh = padded_gather_neighbors(x, nbr_idx)  # [B, K, D]
    m = mask[..., None]
    if reduce == "sum":
        return jnp.sum(jnp.where(m, neigh, 0), axis=1)
    if reduce == "mean":
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1).astype(x.dtype)
        return jnp.sum(jnp.where(m, neigh, 0), axis=1) / cnt
    if reduce == "max":
        neg = jnp.asarray(-jnp.inf, x.dtype)
        out = jnp.max(jnp.where(m, neigh, neg), axis=1)
        return jnp.where(jnp.any(mask, axis=1, keepdims=True), out, 0)
    raise ValueError(f"unknown reduce {reduce!r}")


def padded_softmax(logits: Array, mask: Array, axis: int = 1) -> Array:
    """Masked softmax over the padded neighbor axis (GAT attention)."""
    neg = jnp.asarray(-1e30, logits.dtype)
    z = jnp.where(mask, logits, neg)
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=axis, keepdims=True))
    e = jnp.where(mask, jnp.exp(z), 0)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-16)


# ---------------------------------------------------------------------------
# Edge-list (COO) regime — full graph
# ---------------------------------------------------------------------------


def spmm(
    edge_src: Array,
    edge_dst: Array,
    x: Array,
    num_dst: int,
    reduce: str = "sum",
    edge_weight: Optional[Array] = None,
    indices_are_sorted: bool = True,
) -> Array:
    """out[d] = reduce_{(s,d) in E} (w_e *) x[s]  — the SpMM.

    Edges should be sorted by ``edge_dst`` for TPU efficiency.
    """
    msgs = jnp.take(x, edge_src, axis=0, mode="clip")
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    if reduce in ("sum", "mean"):
        out = jax.ops.segment_sum(
            msgs, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
        )
        if reduce == "mean":
            cnt = jax.ops.segment_sum(
                jnp.ones((edge_src.shape[0],), x.dtype),
                edge_dst,
                num_segments=num_dst,
                indices_are_sorted=indices_are_sorted,
            )
            out = out / jnp.maximum(cnt, 1)[:, None]
        return out
    if reduce == "max":
        return jax.ops.segment_max(
            msgs, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
        )
    raise ValueError(f"unknown reduce {reduce!r}")


def sddmm(edge_src: Array, edge_dst: Array, a: Array, b: Array) -> Array:
    """e_{(s,d)} = <a[d], b[s]> per edge — the SDDMM."""
    return jnp.sum(
        jnp.take(a, edge_dst, axis=0, mode="clip")
        * jnp.take(b, edge_src, axis=0, mode="clip"),
        axis=-1,
    )


def edge_softmax(
    edge_dst: Array, logits: Array, num_dst: int, indices_are_sorted: bool = True
) -> Array:
    """Per-destination softmax over edge logits (GAT full-graph)."""
    mx = jax.ops.segment_max(
        logits, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
    )
    z = logits - jax.lax.stop_gradient(jnp.take(mx, edge_dst, mode="clip"))
    e = jnp.exp(z)
    s = jax.ops.segment_sum(
        e, edge_dst, num_segments=num_dst, indices_are_sorted=indices_are_sorted
    )
    return e / jnp.maximum(jnp.take(s, edge_dst, mode="clip"), 1e-16)

"""End-to-end GNN models.

TPU-native analog of the reference's model layer (reference:
python torch/gnn_model.py:191-261 HomoGNNModel + the pluggable conv backends
:25-43).  The reference dispatches message passing to dgl/pyg/cugraph-ops
("framework" option); those backends don't exist on TPU, so every framework
string maps to the native padded/flax convs (a warning is logged for
non-native names, keeping CLI compatibility).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.structure import MultilayerSample
from ..utils import logger
from .conv import Adj, FullGraph, GATConv, GCNConv, RGCNConv, SAGEConv

Array = jax.Array

_NATIVE_FRAMEWORKS = ("wg", "native", "tpu")


def resolve_framework(name: str) -> str:
    """Reference framework strings (dgl|pyg|wg|cugraph, gnn_model.py:25-43)
    all resolve to the native TPU conv implementations."""
    if name not in _NATIVE_FRAMEWORKS:
        logger.warn(
            "framework %r is not available on TPU; using native convs", name
        )
    return "native"


def make_conv(
    model_type: str,
    out_dim: int,
    *,
    num_heads: int = 1,
    num_relations: int = 0,
    aggregator: str = "mean",
    degree_mode: str = "auto",
):
    mt = model_type.lower()
    if mt in ("sage", "graphsage"):
        return SAGEConv(out_dim=out_dim, aggregator=aggregator)
    if mt == "gcn":
        return GCNConv(out_dim=out_dim, degree_mode=degree_mode)
    if mt == "gat":
        return GATConv(out_dim=out_dim // max(num_heads, 1), num_heads=num_heads)
    if mt == "rgcn":
        return RGCNConv(out_dim=out_dim, num_relations=num_relations)
    raise ValueError(f"unknown model type {model_type!r}")


class HomoGNN(nn.Module):
    """Multi-layer homogeneous GNN for node classification
    (HomoGNNModel analog, gnn_model.py:191-261).

    In sampled mode, call with ``x`` = features of the deepest unique node
    set and ``sample`` = MultilayerSample; hops are consumed deepest-first.
    In full-graph mode, call with ``x`` = all node features and ``graph`` =
    FullGraph; the same conv stack is applied num_layers times.
    """

    model_type: str = "sage"  # sage | gcn | gat | rgcn
    hidden_dim: int = 256
    num_classes: int = 40
    num_layers: int = 2
    num_heads: int = 4
    num_relations: int = 0
    dropout: float = 0.5
    aggregator: str = "mean"  # sage: mean | sum | max
    framework: str = "wg"  # API parity; always resolves to native
    degree_mode: str = "auto"  # gcn: auto | block | true (see GCNConv)

    @nn.compact
    def __call__(
        self,
        x: Array,
        sample: Optional[MultilayerSample] = None,
        graph: Optional[FullGraph] = None,
        edge_types: Optional[Sequence[Array]] = None,
        train: bool = False,
    ) -> Array:
        resolve_framework(self.framework)
        if self.model_type.lower() == "gat":
            assert self.hidden_dim % max(self.num_heads, 1) == 0, (
                f"hidden_dim {self.hidden_dim} must divide num_heads {self.num_heads}"
            )
        L = self.num_layers
        adjs: Sequence[Adj]
        if sample is not None:
            assert len(sample.hops) == L, "fanouts must match num_layers"
            adjs = list(reversed(sample.hops))  # deepest hop first
        else:
            assert graph is not None, "need sample= or graph="
            adjs = [graph] * L

        for i, adj in enumerate(adjs):
            out_dim = self.num_classes if i == L - 1 else self.hidden_dim
            conv = make_conv(
                self.model_type,
                out_dim,
                num_heads=self.num_heads if i < L - 1 else 1,
                num_relations=self.num_relations,
                aggregator=self.aggregator,
                degree_mode=self.degree_mode,
            )
            if self.model_type.lower() == "rgcn":
                et = edge_types[L - 1 - i] if edge_types is not None else None
                if et is None and hasattr(adj, "edge_type"):
                    et = adj.edge_type  # sampled hops carry edge types
                x = conv(x, adj, et)
            else:
                x = conv(x, adj)
            if i < L - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def cross_entropy_loss(logits: Array, labels: Array, mask: Optional[Array] = None):
    """Masked softmax cross-entropy (examples/node_classfication.py loss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if mask is None:
        return -jnp.mean(ll)
    m = mask.astype(logits.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1)


def accuracy(logits: Array, labels: Array, mask: Optional[Array] = None):
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    m = mask.astype(jnp.float32)
    return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1)


class TypedProjection(nn.Module):
    """Project per-type feature rows (different widths) to one common
    width: out = sum_t mask_t * (rows_t @ W_t + b_t).  The hetero-node
    companion of HeteroFeatureStore.gather_typed — model-side trainable
    reconciliation of typed feature spaces (MAG240M-style)."""

    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, rows_by_type: dict, masks_by_type: dict) -> Array:
        out = None
        for name in sorted(rows_by_type):
            h = nn.Dense(self.out_dim, use_bias=self.use_bias, name=f"proj_{name}")(
                rows_by_type[name]
            )
            h = jnp.where(masks_by_type[name][:, None], h, 0)
            out = h if out is None else out + h
        return out


class HeteroGNN(nn.Module):
    """Typed-node + typed-edge GNN (the full MAG240M-style stack).

    Composes :class:`TypedProjection` (per-type feature-width
    reconciliation; input = ``HeteroFeatureStore.gather_typed`` output)
    with the relation-aware conv stack (R-GCN by default — per-relation
    mean aggregation over the unified typed-edge graph; any
    :func:`make_conv` type works).  The reference covers typed edges only
    through DGL-delegated RGCN examples and has no typed-node store
    (SURVEY §2.2 P9/P16); here both halves are native and differentiable
    end-to-end, including per-type sparse table updates through the typed
    gather.
    """

    model_type: str = "rgcn"
    hidden_dim: int = 256
    num_classes: int = 40
    num_layers: int = 2
    num_relations: int = 0
    num_heads: int = 4
    dropout: float = 0.5
    aggregator: str = "mean"

    @nn.compact
    def __call__(
        self,
        rows_by_type: dict,
        masks_by_type: dict,
        sample: Optional[MultilayerSample] = None,
        graph=None,
        train: bool = False,
    ) -> Array:
        x = TypedProjection(self.hidden_dim, name="typed_proj")(
            rows_by_type, masks_by_type
        )
        x = nn.relu(x)
        gnn = HomoGNN(
            model_type=self.model_type,
            hidden_dim=self.hidden_dim,
            num_classes=self.num_classes,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            num_relations=self.num_relations,
            dropout=self.dropout,
            aggregator=self.aggregator,
            name="gnn",
        )
        return gnn(x, sample=sample, graph=graph, train=train)

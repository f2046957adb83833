from .conv import FullGraph, GATConv, GCNConv, RGCNConv, SAGEConv
from .gnn import HeteroGNN, HomoGNN, TypedProjection, accuracy, cross_entropy_loss, make_conv, resolve_framework

__all__ = [
    "FullGraph",
    "GATConv",
    "GCNConv",
    "RGCNConv",
    "SAGEConv",
    "HeteroGNN",
    "HomoGNN",
    "TypedProjection",
    "accuracy",
    "cross_entropy_loss",
    "make_conv",
    "resolve_framework",
]

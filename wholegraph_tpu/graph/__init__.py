from .hetero import HeteroFeatureStore, NodeTypeSpace
from .partitioned import (
    PartitionedGraph,
    degrees,
    eval_full_graph_partitioned,
    halo_stats,
    partition_graph,
    spmm_halo,
)
from .structure import GraphStructure, HopSubgraph, MultilayerSample

__all__ = [
    "GraphStructure",
    "HeteroFeatureStore",
    "HopSubgraph",
    "MultilayerSample",
    "NodeTypeSpace",
    "PartitionedGraph",
    "degrees",
    "eval_full_graph_partitioned",
    "halo_stats",
    "partition_graph",
    "spmm_halo",
]

from .hetero import (
    HeteroFeatureStore,
    NodeTypeSpace,
    build_hetero_graph,
    synthetic_hetero_dataset,
)
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
    "build_hetero_graph",
    "synthetic_hetero_dataset",
    "PartitionedGraph",
    "degrees",
    "eval_full_graph_partitioned",
    "halo_stats",
    "partition_graph",
    "spmm_halo",
]

from .hetero import HeteroFeatureStore, NodeTypeSpace
from .structure import GraphStructure, HopSubgraph, MultilayerSample

__all__ = ["GraphStructure", "HeteroFeatureStore", "HopSubgraph", "MultilayerSample", "NodeTypeSpace"]

"""wholegraph_tpu — a TPU-native GNN training framework.

From-scratch JAX/XLA/Pallas framework with the capabilities of NVIDIA
WholeGraph (reference: rapidsai/wholegraph v24.12.00): a pod-wide row-sharded
embedding/feature store in TPU HBM, distributed gather/scatter over ICI
collectives, fused CSR neighbor sampling, sparse-aggregate message passing,
trainable embeddings with sharded sparse optimizers, and rank-parallel
binary I/O + sharded checkpointing.
"""

from .version import __version__
from .memory import PartitionPlan, ShardedTable
from . import parallel, ops, utils, embedding, graph, io, models, config

__all__ = [
    "__version__",
    "PartitionPlan",
    "ShardedTable",
    "parallel",
    "ops",
    "utils",
    "embedding",
    "graph",
    "io",
    "models",
    "config",
]

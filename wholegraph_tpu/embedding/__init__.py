from .embedding import Embedding, EmbeddingState
from .optimizers import (
    AdaGrad,
    LazyAdam,
    RMSProp,
    SGD,
    SparseOptimizer,
    create_optimizer,
)

__all__ = [
    "Embedding",
    "EmbeddingState",
    "AdaGrad",
    "LazyAdam",
    "RMSProp",
    "SGD",
    "SparseOptimizer",
    "create_optimizer",
]

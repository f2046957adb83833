from .cache import (
    HotCache,
    build_hot_cache,
    gather_with_cache,
    hot_ids_by_degree,
    refresh_hot_cache,
)
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
    "HotCache",
    "build_hot_cache",
    "gather_with_cache",
    "hot_ids_by_degree",
    "refresh_hot_cache",
    "AdaGrad",
    "LazyAdam",
    "RMSProp",
    "SGD",
    "SparseOptimizer",
    "create_optimizer",
]

from .cache import (
    HotCache,
    build_hot_cache,
    gather_with_cache,
    hot_ids_by_degree,
    refresh_hot_cache,
)
from .embedding import Embedding, EmbeddingState
from .host_embedding import HostEmbedding, HostEmbeddingState
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
    "HostEmbedding",
    "HostEmbeddingState",
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

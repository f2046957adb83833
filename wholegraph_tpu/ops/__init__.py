from .gather import gather, scatter, local_take, local_write, local_add
from .graph_ops import (
    add_self_loop_padded,
    append_unique,
    csr_add_self_loop,
    padded_to_csr,
)
from .sampling import SampleResult, csr_sample_neighbors
from . import rng

__all__ = [
    "gather",
    "scatter",
    "local_take",
    "local_write",
    "local_add",
    "add_self_loop_padded",
    "append_unique",
    "csr_add_self_loop",
    "padded_to_csr",
    "SampleResult",
    "csr_sample_neighbors",
    "rng",
]

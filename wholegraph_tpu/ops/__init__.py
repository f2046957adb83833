from .gather import (
    gather,
    gather_hierarchical,
    gather_overflow,
    local_add,
    local_take,
    local_write,
    scatter,
)
from .gather_pallas import (
    choose_gather_kernel,
    gather_rows_window,
    host_gather_rows_window,
    local_take_sorted,
    window_coverage,
)
from . import spmm
from .spmm_pallas import spmm_window
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
    "gather_hierarchical",
    "gather_overflow",
    "spmm",
    "scatter",
    "local_take",
    "local_take_sorted",
    "local_write",
    "local_add",
    "choose_gather_kernel",
    "gather_rows_window",
    "window_coverage",
    "host_gather_rows_window",
    "spmm_window",
    "add_self_loop_padded",
    "append_unique",
    "csr_add_self_loop",
    "padded_to_csr",
    "SampleResult",
    "csr_sample_neighbors",
    "rng",
]

"""Host reference samplers — thin shim over the public testing utilities
(wholegraph_tpu.testing), kept for test-local imports."""

from wholegraph_tpu.ops import rng  # noqa: F401  (tests use hs.rng)
from wholegraph_tpu.testing import (  # noqa: F401
    host_sample_uniform as sample_uniform_host,
    host_sample_weighted as sample_weighted_host,
    random_csr,
)

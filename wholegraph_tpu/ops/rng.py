"""Counter-based RNG, replayable on host.

The reference exposes its device PCG generators to the host precisely so
sampler tests can replay the exact random sequence (reference:
cpp/src/wholegraph_ops/raft_random_gen.cu, wholegraph_op.h:93-105, and the
host replay in graph_sampling_test_utils.cu).  We keep that design pillar
with a TPU-friendly stateless counter hash: ``rand_u32(seed, a, b)`` is a
pure function of its inputs (murmur3-finalizer mixing), implemented with the
same 32-bit ops in both jnp (device) and numpy (host reference), so tests
compare *bit-exactly*.

Keying convention used by the samplers: ``a = center node id``,
``b = hop * MAX_K + slot`` — independent of batch position and world size,
so results are identical across shardings (a property the reference does NOT
have; it seeds per CUDA block).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35
_GOLD = 0x9E3779B9


def _mix_jnp(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_C1)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(_C2)
    x = x ^ (x >> 16)
    return x


def _mix_np(x):
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(_C1)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(_C2)
    x = x ^ (x >> np.uint32(16))
    return x


def rand_u32(seed, a, b):
    """Device (jnp) counter hash → uint32. All args int arrays/scalars."""
    seed = jnp.asarray(seed).astype(jnp.uint32)
    a = jnp.asarray(a).astype(jnp.uint32)
    b = jnp.asarray(b).astype(jnp.uint32)
    h = _mix_jnp(seed ^ jnp.uint32(_GOLD))
    h = _mix_jnp(h ^ a)
    h = _mix_jnp(h ^ b)
    return h


def rand_u32_np(seed, a, b):
    """Host (numpy) replica of :func:`rand_u32` — bit-exact."""
    seed = np.uint32(seed)
    a = np.asarray(a, dtype=np.uint32)
    b = np.asarray(b, dtype=np.uint32)
    with np.errstate(over="ignore"):
        h = _mix_np(seed ^ np.uint32(_GOLD))
        h = _mix_np(h ^ a)
        h = _mix_np(h ^ b)
    return h


def randint(seed, a, b, n):
    """Uniform int in [0, n) via modulo reduction (bias < n/2^32, and both
    replicas use the identical reduction so parity is exact).  n: int array,
    must be >= 1 where used; callers mask elsewhere."""
    r = rand_u32(seed, a, b)
    n = jnp.asarray(n).astype(jnp.uint32)
    return (r % n).astype(jnp.int32)


def randint_np(seed, a, b, n):
    r = rand_u32_np(seed, a, b)
    n = np.asarray(n, dtype=np.uint32)
    return (r % n).astype(np.int32)


def rand_uniform(seed, a, b):
    """Uniform float32 in [0, 1) (24-bit mantissa)."""
    r = rand_u32(seed, a, b)
    return (r >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def rand_uniform_np(seed, a, b):
    r = rand_u32_np(seed, a, b)
    return (r >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24))

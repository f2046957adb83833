"""Collective helpers + consistency guards.

Analog of the reference's communicator utility surface (reference:
cpp/src/wholememory/communicator.hpp — the collective set :38-232 maps to XLA
ops inside shard_map; WM_COMM_CHECK_ALL_SAME :234-263 and host broadcast
helpers map to the utilities here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.error import LogicError


def all_same_check(x, axis_name: str):
    """Inside shard_map: verify a per-device value is identical across the
    axis (WM_COMM_CHECK_ALL_SAME analog).  Returns a bool scalar (all-equal);
    callers can feed it to jax.debug.check or mask downstream."""
    x = jnp.asarray(x)
    mx = lax.pmax(x, axis_name)
    mn = lax.pmin(x, axis_name)
    return jnp.all(mx == mn)


def host_all_same(value, mesh: Optional[Mesh] = None) -> None:
    """Host-level consistency check across processes (multi-host analog of
    the allgather-and-compare handshake).  Raises LogicError on mismatch."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    arr = jnp.asarray(value)
    gathered = multihost_utils.process_allgather(arr)
    first = gathered[0]
    if not bool(jnp.all(jnp.asarray(gathered) == first)):
        raise LogicError(f"host_all_same mismatch: {gathered}")


def host_broadcast(value, root: int = 0):
    """Broadcast a host value from the root process (the analog of the NCCL
    unique-id broadcast, comm.py:133-169 — on TPU only needed for user data)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(
        jnp.asarray(value), is_source=jax.process_index() == root
    )


def barrier() -> None:
    """Process barrier (wholememory_communicator_barrier analog)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("wgtpu_barrier")


def fetch_global(arr) -> "np.ndarray":
    """Host numpy copy of a (possibly multi-controller) jax.Array.

    Single-process: a plain device_get.  Under jax.distributed every
    process holds only its addressable shards, so a direct fetch raises;
    ``process_allgather`` assembles the global value on every host (the
    analog of the reference reading a whole WholeMemory tensor back —
    pods should prefer the per-shard paths, this is for tests/tools)."""
    import numpy as np

    if (
        jax.process_count() == 1
        or getattr(arr, "is_fully_replicated", False)
        or getattr(arr, "is_fully_addressable", False)
    ):
        # replicated / process-local values are directly fetchable (tiled
        # allgather would duplicate replicated rows)
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))

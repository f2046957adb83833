"""ShardedTable — the WholeMemory-equivalent distributed tensor.

TPU-native replacement for the reference's WholeMemory handle + tensor
(reference: cpp/src/wholememory/memory_handle.cpp — continuous / chunked /
distributed / hierarchy mapping types — and wholememory_tensor.cpp).  The
entire pointer-mapping zoo (CUDA VMM, cudaIpc, shm, NVSHMEM) collapses into a
single representation on TPU: one logical ``[n, dim]`` array stored as a
GSPMD row-sharded physical array ``[world*capacity, dim]`` over a named mesh
axis, with the :class:`~wholegraph_tpu.memory.partition.PartitionPlan`
supplying the logical→(shard, slot) map (including non-equal and round-robin
partitions).  Remote access happens through collectives (see ops/gather.py),
never through peer pointers.

The table is a pytree: ``data`` is the traced leaf, everything else is static,
so tables pass freely through jit/shard_map/grad.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gather import axis_size as _axis_size, gather as _gather_rows, scatter as _scatter_rows
from ..utils.error import check_input
from .partition import PartitionPlan

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedTable:
    """A logical ``[n, dim]`` tensor row-sharded over a mesh axis.

    Attributes:
      data: physical array ``[world*capacity, dim]``, sharded ``P(axis, None)``.
      plan: row partition plan.
      mesh: the device mesh.
      axis: mesh axis name the rows are sharded over.
      dim: feature dimension (0 → the table is 1-D ``[n]``).
    """

    data: Array
    plan: PartitionPlan
    mesh: Mesh
    axis: str = "data"

    # -- pytree protocol ------------------------------------------------------

    def tree_flatten(self):
        return (self.data,), (self.plan, self.mesh, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        plan, mesh, axis = aux
        return cls(children[0], plan, mesh, axis)

    # -- properties -----------------------------------------------------------

    @property
    def n(self) -> int:
        return self.plan.n

    @property
    def dim(self) -> int:
        return self.data.shape[1] if self.data.ndim > 1 else 0

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self):
        return (self.n, self.dim) if self.dim else (self.n,)

    @property
    def sharding(self) -> NamedSharding:
        spec = P(self.axis, None) if self.data.ndim > 1 else P(self.axis)
        return NamedSharding(self.mesh, spec)

    @property
    def location(self) -> str:
        """'device' (HBM) or 'host' (pinned host memory) — the analog of
        wholememory_location_t (reference: wholememory.h WML_HOST/WML_DEVICE).

        On GPU a host-located table is directly readable from kernels over
        PCIe; TPU kernels cannot touch host memory, so a host table here is a
        *staging tier* (larger-than-HBM storage, checkpoint staging): call
        :meth:`to_location`('device') before gather/scatter."""
        mk = getattr(self.data.sharding, "memory_kind", None)
        return "host" if mk == "pinned_host" else "device"

    def to_location(self, location: str) -> "ShardedTable":
        """Migrate between HBM and pinned host memory."""
        kind = "pinned_host" if location == "host" else "device"
        spec = P(self.axis, None) if self.data.ndim > 1 else P(self.axis)
        sharding = NamedSharding(self.mesh, spec, memory_kind=kind)
        return dataclasses.replace(self, data=jax.device_put(self.data, sharding))

    # -- creation -------------------------------------------------------------

    @staticmethod
    def create(
        mesh: Mesh,
        n: int,
        dim: int,
        dtype=jnp.float32,
        *,
        axis: str = "data",
        plan: Optional[PartitionPlan] = None,
        init: Optional[Callable] = None,
        key: Optional[Array] = None,
        location: str = "device",
    ) -> "ShardedTable":
        """Collectively allocate a zero/initialised table (create_wholememory
        analog, memory_handle.cpp:1793).  location='host' allocates in pinned
        host memory (staging tier — see :attr:`location`)."""
        world = _axis_size(mesh, axis)
        if plan is None:
            plan = PartitionPlan.equal(n, world)
        check_input(plan.world == world, "plan world != mesh axis size")
        phys_shape = (plan.total_physical_rows, dim) if dim else (plan.total_physical_rows,)
        spec = P(axis, None) if dim else P(axis)
        kind = "pinned_host" if location == "host" else "device"
        sharding = NamedSharding(mesh, spec, memory_kind=kind)
        if init is None:
            if location == "host":
                # jit with pinned_host out_shardings isn't universally
                # supported; stream zeros from the host instead
                data = jax.device_put(np.zeros(phys_shape, np.dtype(dtype)), sharding)
            else:
                make = jax.jit(
                    lambda: jnp.zeros(phys_shape, dtype), out_shardings=sharding
                )
                data = make()
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            dev_sharding = NamedSharding(mesh, spec)
            make = jax.jit(lambda k: init(k, phys_shape, dtype), out_shardings=dev_sharding)
            data = make(key)
            if location == "host":
                data = jax.device_put(data, sharding)
        return ShardedTable(data, plan, mesh, axis)

    @staticmethod
    def from_array(
        mesh: Mesh,
        arr,
        *,
        axis: str = "data",
        plan: Optional[PartitionPlan] = None,
        location: str = "device",
    ) -> "ShardedTable":
        """Build a table from a host/global logical ``[n, dim]`` array,
        permuting rows into the physical partition layout."""
        arr = np.asarray(arr)
        n = arr.shape[0]
        world = _axis_size(mesh, axis)
        if plan is None:
            plan = PartitionPlan.equal(n, world)
        check_input(plan.world == world, "plan world != mesh axis size")
        check_input(plan.n == n, "plan rows != array rows")
        dim = arr.shape[1] if arr.ndim > 1 else 0
        phys_shape = (plan.total_physical_rows, dim) if dim else (plan.total_physical_rows,)
        phys = np.zeros(phys_shape, dtype=arr.dtype)
        phys[plan.physical_index_np(np.arange(n, dtype=np.int64))] = arr
        spec = P(axis, None) if dim else P(axis)
        kind = "pinned_host" if location == "host" else "device"
        data = jax.device_put(phys, NamedSharding(mesh, spec, memory_kind=kind))
        return ShardedTable(data, plan, mesh, axis)

    @staticmethod
    def from_filelist(
        mesh: Mesh,
        filelist,
        dim: int,
        dtype,
        *,
        axis: str = "data",
        plan: Optional[PartitionPlan] = None,
        round_robin_size: int = 0,
    ) -> "ShardedTable":
        """Load a binary filelist (tensor.from_filelist analog,
        torch/tensor.py:155)."""
        from ..io.file_io import load_filelist

        return load_filelist(
            filelist, mesh, dim, dtype, axis=axis, plan=plan,
            round_robin_size=round_robin_size,
        )

    # -- access ---------------------------------------------------------------

    def gather(self, ids, **kw) -> Array:
        """Rows by logical id (wholememory_gather analog)."""
        return _gather_rows(
            self.data, ids, plan=self.plan, mesh=self.mesh, axis=self.axis, **kw
        )

    def scatter(self, ids, rows, **kw) -> "ShardedTable":
        """Write rows by logical id; returns a new table (functional)."""
        data = _scatter_rows(
            self.data, ids, rows, plan=self.plan, mesh=self.mesh, axis=self.axis, **kw
        )
        return dataclasses.replace(self, data=data)

    def to_array(self) -> np.ndarray:
        """Materialise the logical [n, dim] array on host (tests/IO).
        Multi-controller safe: under jax.distributed the global value is
        assembled with process_allgather (pods should prefer per-shard
        access via :meth:`local_shard`)."""
        from ..parallel.collectives import fetch_global

        phys = fetch_global(self.data)
        return phys[self.plan.physical_index_np(np.arange(self.n, dtype=np.int64))]

    def addressable_shard_ids(self):
        """Plan-shard indices whose rows live on THIS process's devices
        (all of them in single-controller runs) — the multi-controller
        analog of the reference's get_local_memory rank scoping."""
        cap = self.plan.capacity
        ids = set()
        for sh in self.data.addressable_shards:
            idx = sh.index[0]
            start = 0 if idx.start is None else int(idx.start)
            ids.add(start // cap)
        return sorted(ids)

    def local_shard(self, s: int) -> np.ndarray:
        """Host copy of shard ``s``'s owned rows (slot order, no padding) —
        get_local_memory analog, used by checkpoint/file IO.  Reads ONLY
        that shard's device buffer (no global fetch); under
        jax.distributed the shard must be addressable from this process
        (see :meth:`addressable_shard_ids`)."""
        cap = self.plan.capacity
        for sh in self.data.addressable_shards:
            idx = sh.index[0]
            start = 0 if idx.start is None else int(idx.start)
            if start == s * cap:
                return np.asarray(sh.data)[: self.plan.shard_rows[s]]
        check_input(
            False,
            f"shard {s} is not addressable from process "
            f"{jax.process_index()} (local shards: "
            f"{self.addressable_shard_ids()})",
        )

    def sub_rows(self, start: int, stop: int) -> np.ndarray:
        """Host copy of logical rows [start, stop) (subtensor analog)."""
        return self.to_array()[start:stop]

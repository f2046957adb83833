"""Row-partition plans for sharded tables.

TPU-native replacement for the reference's address-mapping machinery: the
per-rank entry partition plan (reference: cpp/src/wholememory/memory_handle.cpp:69-78,
``wholememory_determine_entry_partition_plan``), custom non-equal partitions
(``rank_entry_partition``, wholememory.h:259-268), and the round-robin
storage-index↔embedding-index map (cpp/src/wholememory_ops/map_indices_func.cu,
file_io.cpp:102-199).

On GPU the partition is realised through pointer arithmetic over mapped peer
memory; on TPU it is realised through a GSPMD-sharded array of shape
``[world * capacity, dim]`` with shard ``s`` owning physical rows
``[s*capacity, s*capacity + shard_rows[s])``.  The plan maps a *logical* row id
to ``(owner shard, slot within shard)``; all mapping functions are pure,
vectorised jnp, and safe to call inside jit/shard_map (the plan itself is a
hashable static).

Three modes:

* ``block`` equal — shard ``s`` owns logical rows ``[s*per, min((s+1)*per, n))``
  with ``per = ceil(n/world)`` (the reference's default plan).
* ``block`` custom — arbitrary per-shard row counts (non-equal partitions).
* ``round_robin`` — fixed-size blocks of rows dealt round-robin to shards
  (the reference's round-robin file sharding).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.error import check_input


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class PartitionPlan:
    """Static, hashable description of a 1-D row partition over ``world`` shards.

    Attributes:
      n: number of logical rows.
      world: number of shards (devices along the sharding axis).
      shard_rows: rows owned by each shard; ``sum(shard_rows) == n``.
      capacity: per-shard physical slot count.  The physical (padded) array has
        ``world * capacity`` rows; rows past ``shard_rows[s]`` within a shard
        are padding.
      mode: 'block' or 'round_robin'.
      rr_block: round-robin block size (rows per dealt block) when
        ``mode == 'round_robin'``.
    """

    n: int
    world: int
    shard_rows: Tuple[int, ...]
    capacity: int
    mode: str = "block"
    rr_block: int = 0

    # ---- constructors -------------------------------------------------------

    @staticmethod
    def equal(n: int, world: int) -> "PartitionPlan":
        """Default plan: ceil-divided contiguous blocks (reference default)."""
        check_input(n >= 0 and world >= 1, "bad partition args")
        per = _ceil_div(max(n, 1), world)
        rows = tuple(max(0, min(per, n - s * per)) for s in range(world))
        return PartitionPlan(n=n, world=world, shard_rows=rows, capacity=per)

    @staticmethod
    def custom(shard_rows: Tuple[int, ...] | list) -> "PartitionPlan":
        """Non-equal contiguous blocks (reference rank_entry_partition)."""
        rows = tuple(int(r) for r in shard_rows)
        check_input(all(r >= 0 for r in rows), "negative shard size")
        n = sum(rows)
        return PartitionPlan(
            n=n, world=len(rows), shard_rows=rows, capacity=max(max(rows), 1)
        )

    @staticmethod
    def round_robin(n: int, world: int, block: int) -> "PartitionPlan":
        """Blocks of ``block`` rows dealt round-robin to shards (reference
        round-robin file sharding, file_io.cpp:102)."""
        check_input(n >= 0 and world >= 1 and block >= 1, "bad rr partition args")
        nblocks = _ceil_div(n, block)
        rows = []
        for s in range(world):
            # blocks owned by shard s: s, s+world, s+2*world, ...
            full = max(0, (nblocks - s - 1)) // world + (1 if s < nblocks else 0)
            cnt = 0
            b = s
            while b < nblocks:
                cnt += min(block, n - b * block)
                b += world
            del full
            rows.append(cnt)
        capacity = _ceil_div(nblocks, world) * block if nblocks else 1
        return PartitionPlan(
            n=n,
            world=world,
            shard_rows=tuple(rows),
            capacity=max(capacity, 1),
            mode="round_robin",
            rr_block=block,
        )

    # ---- derived (host-side) ------------------------------------------------

    @property
    def is_equal_block(self) -> bool:
        if self.mode != "block":
            return False
        per = self.capacity
        return all(
            r == max(0, min(per, self.n - s * per))
            for s, r in enumerate(self.shard_rows)
        ) and per == _ceil_div(max(self.n, 1), self.world)

    @property
    def offsets(self) -> Tuple[int, ...]:
        """Cumulative logical start row of each shard (block modes)."""
        out, acc = [], 0
        for r in self.shard_rows:
            out.append(acc)
            acc += r
        return tuple(out)

    @property
    def total_physical_rows(self) -> int:
        return self.world * self.capacity

    def shard_row_start(self, s: int) -> int:
        return self.offsets[s]

    def shard_logical_ids(self, s: int) -> np.ndarray:
        """Logical row ids owned by shard ``s``, in slot order (host-side;
        used by file I/O and checkpointing)."""
        if self.mode == "block":
            start = self.offsets[s]
            return np.arange(start, start + self.shard_rows[s], dtype=np.int64)
        # round_robin: blocks s, s+world, ... each of rr_block rows (last clipped)
        ids = []
        b = s
        nblocks = _ceil_div(self.n, self.rr_block) if self.n else 0
        while b < nblocks:
            lo = b * self.rr_block
            hi = min(lo + self.rr_block, self.n)
            ids.append(np.arange(lo, hi, dtype=np.int64))
            b += self.world
        if not ids:
            return np.zeros((0,), dtype=np.int64)
        return np.concatenate(ids)

    # ---- jnp mapping functions (jit-safe) -----------------------------------

    def owner(self, ids):
        """Owning shard of each logical row id. ids: int array."""
        ids = jnp.asarray(ids)
        if self.mode == "round_robin":
            return ((ids // self.rr_block) % self.world).astype(jnp.int32)
        if self.is_equal_block:
            return jnp.minimum(ids // self.capacity, self.world - 1).astype(jnp.int32)
        offs = jnp.asarray(self.offsets + (self.n,), dtype=ids.dtype)
        return (jnp.searchsorted(offs, ids, side="right") - 1).astype(jnp.int32)

    def local_slot(self, ids, owner=None):
        """Slot of each logical row within its owner shard (0..shard_rows[s))."""
        ids = jnp.asarray(ids)
        if self.mode == "round_robin":
            blk = ids // self.rr_block
            return (blk // self.world) * self.rr_block + ids % self.rr_block
        if owner is None:
            owner = self.owner(ids)
        offs = jnp.asarray(self.offsets, dtype=ids.dtype)
        return ids - offs[owner]

    def physical_index(self, ids):
        """Row index into the padded physical ``[world*capacity]`` array."""
        ids = jnp.asarray(ids)
        owner = self.owner(ids)
        return owner.astype(ids.dtype) * self.capacity + self.local_slot(ids, owner)

    def physical_index_np(self, ids: np.ndarray) -> np.ndarray:
        """Host (numpy) version of :meth:`physical_index` for I/O paths."""
        ids = np.asarray(ids, dtype=np.int64)
        if self.mode == "round_robin":
            blk = ids // self.rr_block
            owner = blk % self.world
            slot = (blk // self.world) * self.rr_block + ids % self.rr_block
            return owner * self.capacity + slot
        offs = np.asarray(self.offsets + (self.n,), dtype=np.int64)
        owner = np.searchsorted(offs, ids, side="right") - 1
        slot = ids - offs[owner]
        return owner * self.capacity + slot

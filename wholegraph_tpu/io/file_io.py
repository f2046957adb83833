"""Binary filelist I/O for sharded tables.

TPU-native replacement for the reference's file loader (reference:
cpp/src/wholememory/file_io.cpp — ``wholememory_load_from_file`` reads, per
rank, ONLY that rank's partition rows from an ordered list of binary files,
with plain/round-robin/multi-threaded/O_DIRECT variants; store writes the
local shard).  Here each process assembles the physical (partition-ordered)
buffer for the shards it hosts and device_puts with the table's sharding.

A "filelist" is an ordered list of raw binary files, each a whole number of
``entry_size = dim * dtype.itemsize``-byte rows; rows are numbered globally
in file order (file_io.cpp's file-segment logic).

An optional native accelerator (csrc/fastio.cpp, multi-threaded pread) is
used when built — see wholegraph_tpu.io.native.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..memory.partition import PartitionPlan
from ..ops.gather import axis_size as _axis_size
from ..memory.sharded_table import ShardedTable
from ..utils import logger
from ..utils.error import check_input


def filelist_entry_counts(filelist: Sequence[str], entry_size: int) -> List[int]:
    """Rows per file; validates whole-row sizes (file_io.cpp size checks)."""
    counts = []
    for f in filelist:
        sz = os.path.getsize(f)
        check_input(sz % entry_size == 0, f"{f}: size {sz} not a multiple of {entry_size}")
        counts.append(sz // entry_size)
    return counts


def _read_rows(
    filelist: Sequence[str],
    file_starts: np.ndarray,
    entry_size: int,
    lo: int,
    hi: int,
    out: np.ndarray,
) -> None:
    """Read global rows [lo, hi) from the filelist into out (flat bytes)."""
    total = file_starts[-1]
    check_input(hi <= total, f"row range [{lo},{hi}) exceeds total {total}")
    fi = int(np.searchsorted(file_starts, lo, side="right") - 1)
    row = lo
    off_out = 0
    while row < hi:
        fstart = file_starts[fi]
        fend = file_starts[fi + 1]
        r0 = row - fstart
        r1 = min(hi, fend) - fstart
        nbytes = (r1 - r0) * entry_size
        with open(filelist[fi], "rb") as fh:
            fh.seek(r0 * entry_size)
            buf = fh.read(nbytes)
        check_input(len(buf) == nbytes, f"short read from {filelist[fi]}")
        out[off_out : off_out + nbytes] = np.frombuffer(buf, np.uint8)
        off_out += nbytes
        row = fstart + r1
        fi += 1


def load_filelist(
    filelist: Sequence[str],
    mesh: Mesh,
    dim: int,
    dtype,
    *,
    axis: str = "data",
    plan: Optional[PartitionPlan] = None,
    round_robin_size: int = 0,
    expected_rows: Optional[int] = None,
) -> ShardedTable:
    """Load a binary filelist into a new ShardedTable
    (wholememory_load_from_file analog, wholememory.h:450-456).

    round_robin_size > 0 reproduces the reference's round-robin shard layout
    (read_file_list_to_local_memory_roundrobin, file_io.cpp:102): consecutive
    blocks of that many rows are dealt to shards in turn.
    """
    if isinstance(filelist, str):
        filelist = [filelist]
    dt = np.dtype(dtype)
    entry_size = max(dim, 1) * dt.itemsize
    counts = filelist_entry_counts(filelist, entry_size)
    n = sum(counts)
    if expected_rows is not None:
        check_input(n == expected_rows, f"filelist has {n} rows, expected {expected_rows}")
    world = _axis_size(mesh, axis)
    if plan is None:
        plan = (
            PartitionPlan.round_robin(n, world, round_robin_size)
            if round_robin_size
            else PartitionPlan.equal(n, world)
        )
    check_input(plan.n == n and plan.world == world, "plan mismatch with filelist/mesh")
    file_starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    try:
        from .native import read_rows_native
    except Exception:  # pragma: no cover
        read_rows_native = None

    phys = np.zeros((plan.total_physical_rows, entry_size), np.uint8)
    for s in range(world):
        # contiguous logical runs owned by shard s, in slot order
        lids = plan.shard_logical_ids(s)
        if len(lids) == 0:
            continue
        # split into contiguous runs for big sequential reads
        breaks = np.nonzero(np.diff(lids) != 1)[0] + 1
        runs = np.split(lids, breaks)
        slot = 0
        base = s * plan.capacity
        for run in runs:
            lo, hi = int(run[0]), int(run[-1]) + 1
            dst = phys[base + slot : base + slot + (hi - lo)].reshape(-1)
            if read_rows_native is not None:
                read_rows_native(filelist, file_starts, entry_size, lo, hi, dst)
            else:
                _read_rows(filelist, file_starts, entry_size, lo, hi, dst)
            slot += hi - lo
    shape = (plan.total_physical_rows, dim) if dim else (plan.total_physical_rows,)
    arr = phys.reshape(-1)[: plan.total_physical_rows * entry_size]
    arr = np.frombuffer(arr.tobytes(), dt).reshape(shape)
    spec = P(axis, None) if dim else P(axis)
    data = jax.device_put(arr, NamedSharding(mesh, spec))
    logger.debug("loaded %d rows x %d from %d files", n, dim, len(filelist))
    return ShardedTable(data, plan, mesh, axis)


def store_table(table: ShardedTable, path_prefix: str) -> List[str]:
    """Write each shard's owned rows to ``{prefix}_part_{s}_of_{W}``
    (wholememory_store_to_file analog; per-rank shard files as in
    WholeMemoryEmbedding.save, torch/embedding.py:358-377).  Uses the native
    threaded writer (csrc/fastio.cpp wgtpu_write_rows) when built."""
    try:
        from .native import write_rows_native
    except Exception:  # pragma: no cover
        write_rows_native = None
    paths = []
    for s in range(table.plan.world):
        shard = table.local_shard(s)
        p = f"{path_prefix}_part_{s}_of_{table.plan.world}"
        if write_rows_native is not None:
            write_rows_native(p, shard)
        else:
            shard.tofile(p)
        paths.append(p)
    return paths


def load_table_from_parts(
    path_prefix: str,
    part_count: int,
    mesh: Mesh,
    dim: int,
    dtype,
    *,
    axis: str = "data",
    plan: Optional[PartitionPlan] = None,
    saved_plan: Optional[PartitionPlan] = None,
) -> ShardedTable:
    """Reload from part files written by :func:`store_table` — repartition
    tolerant: the new mesh/world may differ from ``part_count``.

    For block-partition saves the parts concatenate to logical row order and
    stream through :func:`load_filelist`; for round-robin saves pass the
    ``saved_plan`` so rows are put back in logical order first."""
    filelist = [f"{path_prefix}_part_{s}_of_{part_count}" for s in range(part_count)]
    if saved_plan is not None and saved_plan.mode != "block":
        dt = np.dtype(dtype)
        logical = np.zeros(
            (saved_plan.n, dim) if dim else (saved_plan.n,), dt
        )
        for s, f in enumerate(filelist):
            rows = np.fromfile(f, dt)
            rows = rows.reshape(-1, dim) if dim else rows
            logical[saved_plan.shard_logical_ids(s)] = rows
        return ShardedTable.from_array(mesh, logical, axis=axis, plan=plan)
    return load_filelist(filelist, mesh, dim, dtype, axis=axis, plan=plan)

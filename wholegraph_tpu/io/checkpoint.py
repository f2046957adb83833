"""Embedding / table checkpointing.

TPU-native analog of the reference's save/load flow (reference:
python torch/embedding.py:358-377 — WholeMemoryEmbedding.save writes
``prefix_embedding_tensor`` and ``prefix_<state>`` with ``part_count`` files,
reload is repartition-tolerant via the part file list; backed by
wholememory_store_to_file / wholememory_load_from_file, wholememory.h:450-472).

We add a small JSON meta file recording shapes/dtypes/step so reload is
self-describing.

Saves go through a two-phase manifest: SNAPSHOT (device->host numpy copies of
every shard, on the caller thread — safe even when the training step donates
and overwrites the table buffers) then WRITE (part files via the native
threaded writer, each through a ``.tmp`` + rename, meta files LAST so a meta's
presence marks a complete checkpoint).  :class:`AsyncCheckpointer` runs the
WRITE phase on a background thread — async checkpointing the reference lacks
(its store, wholememory.h:450-472, is synchronous).
"""

from __future__ import annotations

import json
import os
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..embedding.embedding import Embedding, EmbeddingState
from ..memory.partition import PartitionPlan
from ..memory.sharded_table import ShardedTable
from ..utils.error import check_input
from .file_io import load_table_from_parts

# manifest: ([(part_path, numpy_rows), ...], [(meta_path, meta_dict), ...])
Manifest = Tuple[List[Tuple[str, np.ndarray]], List[Tuple[str, dict]]]


def _table_parts(table: ShardedTable, path_prefix: str):
    # multi-controller: each process snapshots ONLY its addressable shards
    # (disjoint part files across processes; single-controller = all)
    return [
        (f"{path_prefix}_part_{s}_of_{table.plan.world}", table.local_shard(s))
        for s in table.addressable_shard_ids()
    ]


def _fsync_path(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(path: str) -> None:
    try:
        _fsync_path(os.path.dirname(os.path.abspath(path)))
    except OSError:  # pragma: no cover - some filesystems refuse dir fsync
        pass


def _write_manifest(manifest: Manifest) -> None:
    """Durable commit protocol: every part file is written to a tmp name,
    fsynced, then renamed; the meta file (the commit marker — its presence
    declares the checkpoint complete) is written LAST the same way, and the
    directory is fsynced after each rename so a crash/power loss can never
    leave a durable meta pointing at missing or truncated parts."""
    try:
        from .native import write_rows_native
    except Exception:  # pragma: no cover
        write_rows_native = None
    files, metas = manifest
    for path, rows in files:
        tmp = path + ".tmp"
        if write_rows_native is not None:
            write_rows_native(tmp, rows)
        else:
            rows.tofile(tmp)
        _fsync_path(tmp)
        os.replace(tmp, path)
        _fsync_dir(path)
    # multi-controller: every process must have its parts durable BEFORE
    # the commit marker lands, and only process 0 writes the marker
    import jax

    if jax.process_count() > 1:
        from ..parallel.collectives import barrier

        barrier()
        if jax.process_index() != 0:
            return
    for path, meta in metas:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        _fsync_dir(path)


def _embedding_manifest(
    emb: Embedding, state: EmbeddingState, directory: str, name: str
) -> Manifest:
    os.makedirs(directory, exist_ok=True)
    cap = emb.plan.total_physical_rows
    flat = lambda a: a if a.ndim == 2 else a.reshape(cap, emb.dim)
    files = _table_parts(
        ShardedTable(flat(state.table), emb.plan, emb.mesh, emb.axis),
        os.path.join(directory, f"{name}_embedding_tensor"),
    )
    for slot_name, arr in state.slots.items():
        files += _table_parts(
            ShardedTable(flat(arr), emb.plan, emb.mesh, emb.axis),
            os.path.join(directory, f"{name}_{slot_name}"),
        )
    meta = {
        "name": name,
        "part_count": emb.plan.world,
        "rows": emb.plan.n,
        "dim": emb.dim,
        "dtype": np.dtype(emb.dtype).name,
        "slots": sorted(state.slots),
        "step": int(state.step),
        "optimizer": emb.optimizer.name,
        "plan_mode": emb.plan.mode,
        "rr_block": emb.plan.rr_block,
        "shard_rows": list(emb.plan.shard_rows),
    }
    return files, [(os.path.join(directory, f"{name}_meta.json"), meta)]


def save_embedding(emb: Embedding, state: EmbeddingState, directory: str, name: str) -> None:
    """Write table + optimizer slots + meta under ``directory``."""
    _write_manifest(_embedding_manifest(emb, state, directory, name))


def load_embedding(emb: Embedding, directory: str, name: str) -> EmbeddingState:
    """Reload; the current mesh/world may differ from the saved part_count
    (repartition-tolerant, as in the reference's part_count reload)."""
    with open(os.path.join(directory, f"{name}_meta.json")) as f:
        meta = json.load(f)
    check_input(meta["rows"] == emb.plan.n and meta["dim"] == emb.dim, "shape mismatch")
    check_input(
        sorted(emb.optimizer.slot_names) == meta["slots"],
        f"optimizer slots mismatch: {meta['slots']} vs {emb.optimizer.slot_names}",
    )
    pc = meta["part_count"]
    saved_plan = _plan_from_meta(meta)
    table = load_table_from_parts(
        os.path.join(directory, f"{name}_embedding_tensor"),
        pc, emb.mesh, emb.dim, meta["dtype"], axis=emb.axis, plan=emb.plan,
        saved_plan=saved_plan,
    )
    to_native = jax.jit(
        lambda t: t.reshape(emb.plan.total_physical_rows, *emb._row_shape),
        out_shardings=emb._sharding,
    )
    slots = {}
    for s in meta["slots"]:
        slots[s] = to_native(
            load_table_from_parts(
                os.path.join(directory, f"{name}_{s}"),
                pc, emb.mesh, emb.dim, "float32", axis=emb.axis, plan=emb.plan,
                saved_plan=saved_plan,
            ).data
        )
    return EmbeddingState(
        to_native(table.data), slots, jnp.asarray(meta["step"], jnp.int32)
    )


def _flat_host_parts(flat, plan, dim: int, path_prefix: str):
    """Part files for a FLAT host-tier shard array (row r of shard s is
    flat[(s*capacity + r)*dim : +dim]); identical bytes to the 2-D layout,
    so the files interop with load_table_from_parts.  Multi-controller:
    each process reads only ITS addressable flat shards (one per device,
    capacity*dim elements each)."""
    cap = plan.capacity
    parts = []
    for sh in flat.addressable_shards:
        idx = sh.index[0]
        start = 0 if idx.start is None else int(idx.start)
        s = start // (cap * dim)
        rows = np.asarray(sh.data).reshape(-1, dim)[: plan.shard_rows[s]]
        parts.append((f"{path_prefix}_part_{s}_of_{plan.world}", rows))
    return sorted(parts)


def _host_embedding_manifest(emb, state, directory: str, name: str) -> Manifest:
    import jax

    os.makedirs(directory, exist_ok=True)
    files = _flat_host_parts(
        state.host_table, emb.plan, emb.dim,
        os.path.join(directory, f"{name}_embedding_tensor"),
    )
    for slot_name, arr in state.host_slots.items():
        files += _flat_host_parts(
            arr, emb.plan, emb.dim,
            os.path.join(directory, f"{name}_{slot_name}"),
        )
    from ..parallel.collectives import fetch_global

    cmap = fetch_global(state.cache_map)
    phys_hot = np.nonzero(cmap >= 0)[0]
    # physical slot -> logical id (inverse of the plan's physical map)
    logical = np.full(emb.plan.total_physical_rows, -1, np.int64)
    all_ids = np.arange(emb.plan.n, dtype=np.int64)
    logical[emb.plan.physical_index_np(all_ids)] = all_ids
    hot_ids = np.sort(logical[phys_hot])
    # small sidecar, written in the snapshot phase (meta still lands last);
    # one writer under multi-controller (identical content on all procs)
    if jax.process_index() == 0:
        np.save(os.path.join(directory, f"{name}_hot_ids.npy"), hot_ids)
    meta = {
        "name": name,
        "part_count": emb.plan.world,
        "rows": emb.plan.n,
        "dim": emb.dim,
        "dtype": np.dtype(emb.dtype).name,
        "slots": sorted(state.host_slots),
        "step": int(state.step),
        "optimizer": emb.optimizer.name,
        "plan_mode": emb.plan.mode,
        "rr_block": emb.plan.rr_block,
        "shard_rows": list(emb.plan.shard_rows),
        "host_tier": True,
    }
    return files, [(os.path.join(directory, f"{name}_meta.json"), meta)]


def save_host_embedding(emb, state, directory: str, name: str) -> None:
    """Checkpoint a device-cached-host embedding: host table + optimizer
    slots as part files (same format as :func:`save_embedding`) plus the
    hot-id set, so reload rebuilds the cache coherently."""
    _write_manifest(_host_embedding_manifest(emb, state, directory, name))


def load_host_embedding(emb, directory: str, name: str):
    """Reload a host-tier embedding (repartition-tolerant via part files);
    cache lines are re-captured from the loaded table."""
    import jax

    with open(os.path.join(directory, f"{name}_meta.json")) as f:
        meta = json.load(f)
    check_input(meta["rows"] == emb.plan.n and meta["dim"] == emb.dim, "shape mismatch")
    check_input(
        sorted(emb.optimizer.slot_names) == meta["slots"], "optimizer slots mismatch"
    )
    pc = meta["part_count"]
    saved_plan = _plan_from_meta(meta)
    table = load_table_from_parts(
        os.path.join(directory, f"{name}_embedding_tensor"),
        pc, emb.mesh, emb.dim, meta["dtype"], axis=emb.axis, plan=emb.plan,
        saved_plan=saved_plan,
    )
    hot_ids = np.load(os.path.join(directory, f"{name}_hot_ids.npy"))
    state = emb.from_array(table.to_array(), hot_ids=hot_ids if len(hot_ids) else None)
    host_slots = {}
    for s in meta["slots"]:
        arr = load_table_from_parts(
            os.path.join(directory, f"{name}_{s}"),
            pc, emb.mesh, emb.dim, "float32", axis=emb.axis, plan=emb.plan,
            saved_plan=saved_plan,
        ).data
        # host-tier slot shards are stored FLAT (see HostEmbedding)
        from ..parallel.collectives import fetch_global

        host_slots[s] = jax.device_put(
            fetch_global(arr).reshape(-1),
            state.host_slots[s].sharding,
        )
    state.host_slots = host_slots
    state.step = jnp.asarray(meta["step"], jnp.int32)
    return state


def _plan_from_meta(meta) -> Optional[PartitionPlan]:
    if meta.get("plan_mode", "block") == "round_robin":
        return PartitionPlan.round_robin(
            meta["rows"], meta["part_count"], meta["rr_block"]
        )
    if "shard_rows" in meta:
        return PartitionPlan.custom(tuple(meta["shard_rows"]))
    return None


def _table_manifest(table: ShardedTable, directory: str, name: str) -> Manifest:
    os.makedirs(directory, exist_ok=True)
    files = _table_parts(table, os.path.join(directory, name))
    meta = {
        "part_count": table.plan.world,
        "rows": table.plan.n,
        "dim": table.dim,
        "dtype": np.dtype(table.dtype).name,
        "plan_mode": table.plan.mode,
        "rr_block": table.plan.rr_block,
        "shard_rows": list(table.plan.shard_rows),
    }
    return files, [(os.path.join(directory, f"{name}_meta.json"), meta)]


def save_table_checkpoint(table: ShardedTable, directory: str, name: str) -> None:
    _write_manifest(_table_manifest(table, directory, name))


def load_table_checkpoint(
    mesh, directory: str, name: str, *, axis: str = "data",
    plan: Optional[PartitionPlan] = None,
) -> ShardedTable:
    with open(os.path.join(directory, f"{name}_meta.json")) as f:
        meta = json.load(f)
    return load_table_from_parts(
        os.path.join(directory, name),
        meta["part_count"], mesh, meta["dim"], meta["dtype"], axis=axis, plan=plan,
        saved_plan=_plan_from_meta(meta),
    )


class AsyncCheckpointer:
    """Asynchronous checkpoint writer.

    ``save_*`` methods snapshot all device shards to host numpy on the
    CALLER's thread (so the training loop may immediately donate/overwrite
    the buffers) and enqueue the disk write on a single background worker.
    Writes within one checkpoint keep the manifest order guarantee (meta
    last); checkpoints are written in submission order.  ``wait()`` blocks
    until the queue drains and re-raises the first writer error.

    The reference's store path (wholememory.h:450-472) is synchronous; this
    is the orbax-style overlap of training and checkpoint IO.

        ckpt = AsyncCheckpointer()
        for epoch ...:
            state = train_epoch(state)
            ckpt.save_embedding(emb, state, dir, "emb")   # returns at once
        ckpt.wait()
    """

    def __init__(self, max_pending: int = 2):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="wgtpu-ckpt"
        )
        self._max_pending = max_pending
        self._futures: List = []
        self._lock = threading.Lock()

    def _submit(self, manifest: Manifest) -> None:
        with self._lock:
            # bound memory: at most max_pending snapshots alive
            while len([f for f in self._futures if not f.done()]) >= self._max_pending:
                self._futures.pop(0).result()
            self._futures.append(self._pool.submit(_write_manifest, manifest))

    def save_embedding(self, emb, state, directory: str, name: str) -> None:
        self._submit(_embedding_manifest(emb, state, directory, name))

    def save_host_embedding(self, emb, state, directory: str, name: str) -> None:
        self._submit(_host_embedding_manifest(emb, state, directory, name))

    def save_table(self, table: ShardedTable, directory: str, name: str) -> None:
        self._submit(_table_manifest(table, directory, name))

    def wait(self) -> None:
        with self._lock:
            futures, self._futures = self._futures, []
        for f in futures:
            f.result()

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""Embedding / table checkpointing.

TPU-native analog of the reference's save/load flow (reference:
python torch/embedding.py:358-377 — WholeMemoryEmbedding.save writes
``prefix_embedding_tensor`` and ``prefix_<state>`` with ``part_count`` files,
reload is repartition-tolerant via the part file list; backed by
wholememory_store_to_file / wholememory_load_from_file, wholememory.h:450-472).

We add a small JSON meta file recording shapes/dtypes/step so reload is
self-describing.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..embedding.embedding import Embedding, EmbeddingState
from ..memory.partition import PartitionPlan
from ..memory.sharded_table import ShardedTable
from ..utils.error import check_input
from .file_io import load_table_from_parts, store_table


def save_embedding(emb: Embedding, state: EmbeddingState, directory: str, name: str) -> None:
    """Write table + optimizer slots + meta under ``directory``."""
    os.makedirs(directory, exist_ok=True)
    table = ShardedTable(state.table, emb.plan, emb.mesh, emb.axis)
    store_table(table, os.path.join(directory, f"{name}_embedding_tensor"))
    for slot_name, arr in state.slots.items():
        store_table(
            ShardedTable(arr, emb.plan, emb.mesh, emb.axis),
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
    with open(os.path.join(directory, f"{name}_meta.json"), "w") as f:
        json.dump(meta, f)


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
    slots = {}
    for s in meta["slots"]:
        slots[s] = load_table_from_parts(
            os.path.join(directory, f"{name}_{s}"),
            pc, emb.mesh, emb.dim, "float32", axis=emb.axis, plan=emb.plan,
            saved_plan=saved_plan,
        ).data
    return EmbeddingState(table.data, slots, jnp.asarray(meta["step"], jnp.int32))


def save_host_embedding(emb, state, directory: str, name: str) -> None:
    """Checkpoint a device-cached-host embedding: host table + optimizer
    slots as part files (same format as :func:`save_embedding`) plus the
    hot-id set, so reload rebuilds the cache coherently."""
    os.makedirs(directory, exist_ok=True)
    store_table(
        ShardedTable(state.host_table, emb.plan, emb.mesh, emb.axis),
        os.path.join(directory, f"{name}_embedding_tensor"),
    )
    for slot_name, arr in state.host_slots.items():
        store_table(
            ShardedTable(arr, emb.plan, emb.mesh, emb.axis),
            os.path.join(directory, f"{name}_{slot_name}"),
        )
    import jax

    cmap = np.asarray(jax.device_get(state.cache_map))
    phys_hot = np.nonzero(cmap >= 0)[0]
    # physical slot -> logical id (inverse of the plan's physical map)
    logical = np.full(emb.plan.total_physical_rows, -1, np.int64)
    all_ids = np.arange(emb.plan.n, dtype=np.int64)
    logical[emb.plan.physical_index_np(all_ids)] = all_ids
    hot_ids = np.sort(logical[phys_hot])
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
    with open(os.path.join(directory, f"{name}_meta.json"), "w") as f:
        json.dump(meta, f)


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
        host_slots[s] = jax.device_put(arr, state.host_slots[s].sharding)
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


def save_table_checkpoint(table: ShardedTable, directory: str, name: str) -> None:
    os.makedirs(directory, exist_ok=True)
    store_table(table, os.path.join(directory, name))
    meta = {
        "part_count": table.plan.world,
        "rows": table.plan.n,
        "dim": table.dim,
        "dtype": np.dtype(table.dtype).name,
        "plan_mode": table.plan.mode,
        "rr_block": table.plan.rr_block,
        "shard_rows": list(table.plan.shard_rows),
    }
    with open(os.path.join(directory, f"{name}_meta.json"), "w") as f:
        json.dump(meta, f)


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

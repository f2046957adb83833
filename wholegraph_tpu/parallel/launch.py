"""Multi-host launch glue.

Analog of the reference's launcher layer (reference: python
torch/distributed_launch.py:190-374 — mpi / torchrun / spawn launch agents
and env-var rank/world handling :169-188, plus torch/initialize.py:22-83).
On TPU, process bootstrap is ``jax.distributed.initialize`` (coordinator
address + process id) and collectives need no NCCL unique-id exchange.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..utils import logger
from . import mesh as mesh_mod


def _env(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return v
    return default


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX (init_torch_env analog, initialize.py:28-54).

    Resolution order mirrors distributed_launch.py:169-188: explicit args,
    then env vars (MASTER_ADDR/MASTER_PORT, RANK, WORLD_SIZE — the reference's
    names — or their JAX equivalents), else single-process.
    """
    if num_processes is None:
        num_processes = int(_env("WORLD_SIZE", "JAX_NUM_PROCESSES", default="1"))
    if num_processes <= 1:
        logger.debug("single-process run; skipping jax.distributed init")
        return
    if process_id is None:
        process_id = int(_env("RANK", "JAX_PROCESS_ID", default="0"))
    if coordinator_address is None:
        addr = _env("MASTER_ADDR", default="127.0.0.1")
        port = _env("MASTER_PORT", default="12355")
        coordinator_address = f"{addr}:{port}"
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialised: process %d/%d @ %s",
        process_id,
        num_processes,
        coordinator_address,
    )


def init(use_hierarchy: bool = False):
    """Library init: distributed bootstrap + cached meshes
    (init_torch_env_and_create_wm_comm analog, initialize.py:56-83).
    Returns the global (or hierarchy) mesh."""
    init_distributed()
    mesh_mod.reset_meshes()
    return mesh_mod.get_hierarchy_mesh() if use_hierarchy else mesh_mod.get_global_mesh()


def finalize() -> None:
    """Shutdown (finalize analog)."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass
    mesh_mod.reset_meshes()

"""Device-mesh management — the communicator layer, TPU style.

Replaces the reference's communicator stack (reference:
cpp/src/wholememory/communicator.{hpp,cpp}, nccl_comms.cpp and the cached
communicator getters in python torch/comm.py:199-280).  On TPU there is no
NCCL bootstrap: collectives are XLA ops over named mesh axes, so a
"communicator" is just a :class:`jax.sharding.Mesh` (or an axis of one).

Provided meshes (mirroring comm.py's global / local-node / local-device set):

* global 1-D mesh over all devices — axis ``'data'`` (the WholeMemory global
  communicator);
* hierarchical 2-D mesh ``('node', 'device')`` — hosts × chips-per-host,
  the analog of MT_HIERARCHY's cross/local communicator split
  (memory_handle.cpp:1756-1791) laid out so ``'device'`` collectives ride ICI
  and ``'node'`` collectives ride DCN;
* sub-meshes by (size, stride) grouping, the analog of
  ``create_group_communicator`` (comm.py:133-169), and split-by-color
  (``wholememory_split_communicator``, wholememory.h:171-174).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..utils import logger
from ..utils.error import check_input

# Default axis names
DATA_AXIS = "data"
NODE_AXIS = "node"
DEVICE_AXIS = "device"

_global_mesh: Optional[Mesh] = None
_hierarchy_mesh: Optional[Mesh] = None


def create_global_mesh(
    devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D mesh over all (or given) devices — the global communicator."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def create_hierarchy_mesh(
    num_nodes: Optional[int] = None,
    devices_per_node: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D (node × device) mesh, the MT_HIERARCHY analog.

    Defaults to jax's process topology: ``num_nodes = jax.process_count()``,
    ``devices_per_node = jax.local_device_count()``.  Device order follows
    ``jax.devices()`` which groups by process, so rows of the mesh are hosts
    (DCN axis) and columns are chips within a host (ICI axis).
    """
    if devices is None:
        devices = jax.devices()
    if num_nodes is None:
        num_nodes = jax.process_count()
    if devices_per_node is None:
        devices_per_node = len(devices) // num_nodes
    check_input(
        num_nodes * devices_per_node == len(devices),
        f"{num_nodes}x{devices_per_node} != {len(devices)} devices",
    )
    arr = np.asarray(devices).reshape(num_nodes, devices_per_node)
    return Mesh(arr, (NODE_AXIS, DEVICE_AXIS))


def get_global_mesh() -> Mesh:
    """Cached global 1-D mesh (comm.py:199 get_global_communicator analog)."""
    global _global_mesh
    if _global_mesh is None:
        _global_mesh = create_global_mesh()
        logger.debug("created global mesh over %d devices", _global_mesh.size)
    return _global_mesh


def get_hierarchy_mesh() -> Mesh:
    """Cached (node, device) mesh (get_local_node_communicator analog)."""
    global _hierarchy_mesh
    if _hierarchy_mesh is None:
        _hierarchy_mesh = create_hierarchy_mesh()
    return _hierarchy_mesh


def set_global_mesh(mesh: Mesh) -> None:
    global _global_mesh
    _global_mesh = mesh


def reset_meshes() -> None:
    global _global_mesh, _hierarchy_mesh
    _global_mesh = None
    _hierarchy_mesh = None


def create_group_mesh(group_size: int, group_stride: int = 1, axis_name: str = DATA_AXIS):
    """Split all devices into groups of ``group_size`` with ``group_stride``,
    returning the list of 1-D meshes (create_group_communicator analog,
    comm.py:133-169).  group_stride=1 → adjacent devices grouped; stride=k →
    devices i, i+k, i+2k, ... grouped."""
    devices = jax.devices()
    n = len(devices)
    check_input(group_size * group_stride <= n and n % group_size == 0, "bad grouping")
    meshes = []
    num_groups = n // group_size
    for g in range(num_groups):
        if group_stride == 1:
            members = devices[g * group_size : (g + 1) * group_size]
        else:
            base = (g // group_stride) * group_size * group_stride + g % group_stride
            members = [devices[base + i * group_stride] for i in range(group_size)]
        meshes.append(Mesh(np.asarray(members), (axis_name,)))
    return meshes


def split_mesh_by_color(mesh: Mesh, colors: Sequence[int], axis_name: str = DATA_AXIS):
    """Split a 1-D mesh's devices by color (wholememory_split_communicator
    analog).  Returns {color: Mesh}."""
    devs = list(mesh.devices.flat)
    check_input(len(colors) == len(devs), "colors length mismatch")
    out = {}
    for c in sorted(set(int(c) for c in colors if c >= 0)):
        members = [d for d, cc in zip(devs, colors) if int(cc) == c]
        out[c] = Mesh(np.asarray(members), (axis_name,))
    return out


def world_size(mesh: Optional[Mesh] = None) -> int:
    return (mesh or get_global_mesh()).size


def process_rank() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()

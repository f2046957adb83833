from . import collectives, launch
from .mesh import (
    DATA_AXIS,
    DEVICE_AXIS,
    NODE_AXIS,
    create_global_mesh,
    create_group_mesh,
    create_hierarchy_mesh,
    get_global_mesh,
    get_hierarchy_mesh,
    process_count,
    process_rank,
    reset_meshes,
    set_global_mesh,
    split_mesh_by_color,
    world_size,
)

__all__ = [
    "DATA_AXIS",
    "DEVICE_AXIS",
    "NODE_AXIS",
    "create_global_mesh",
    "create_group_mesh",
    "create_hierarchy_mesh",
    "get_global_mesh",
    "get_hierarchy_mesh",
    "process_count",
    "process_rank",
    "reset_meshes",
    "set_global_mesh",
    "split_mesh_by_color",
    "world_size",
]

from .file_io import (
    filelist_entry_counts,
    load_filelist,
    load_table_from_parts,
    store_table,
)
from .checkpoint import (
    AsyncCheckpointer,
    load_embedding,
    load_host_embedding,
    load_table_checkpoint,
    save_embedding,
    save_host_embedding,
    save_table_checkpoint,
)

__all__ = [
    "AsyncCheckpointer",
    "filelist_entry_counts",
    "load_filelist",
    "load_table_from_parts",
    "store_table",
    "load_embedding",
    "load_host_embedding",
    "load_table_checkpoint",
    "save_embedding",
    "save_host_embedding",
    "save_table_checkpoint",
]

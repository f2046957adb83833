from .gather import gather, scatter, local_take, local_write, local_add

__all__ = ["gather", "scatter", "local_take", "local_write", "local_add"]

"""Dtype registry and converters.

TPU-native analog of the reference's dtype enum + descriptor helpers
(reference: cpp/include/wholememory/tensor_description.h:29-99 and
python torch/utils.py dtype mappers). We expose the same logical dtype set,
mapped onto jax/numpy dtypes, plus string parsers used by config/CLI and the
binary file loader (element sizes must match the reference's on-disk layout).
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

# Logical dtype names mirroring wholememory_dtype_t (tensor_description.h:29-41)
DTYPES = {
    "float": jnp.float32,
    "float32": jnp.float32,
    "half": jnp.float16,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "double": jnp.float64,
    "float64": jnp.float64,
    "int8": jnp.int8,
    "int16": jnp.int16,
    "int": jnp.int32,
    "int32": jnp.int32,
    "int64": jnp.int64,
    "uint8": jnp.uint8,
    "uint32": jnp.uint32,
    "uint64": jnp.uint64,
}

_NP_EQUIV = {
    jnp.float32: np.float32,
    jnp.float16: np.float16,
    jnp.bfloat16: np.dtype(jnp.bfloat16),
    jnp.float64: np.float64,
    jnp.int8: np.int8,
    jnp.int16: np.int16,
    jnp.int32: np.int32,
    jnp.int64: np.int64,
    jnp.uint8: np.uint8,
    jnp.uint32: np.uint32,
    jnp.uint64: np.uint64,
}

DtypeLike = Union[str, np.dtype, type]


def as_jax_dtype(dt: DtypeLike):
    """Parse a dtype name / numpy dtype / jax dtype into a jax dtype."""
    if isinstance(dt, str):
        key = dt.lower()
        if key not in DTYPES:
            raise ValueError(f"unknown dtype name: {dt!r}")
        return DTYPES[key]
    return jnp.dtype(dt).type


def as_numpy_dtype(dt: DtypeLike) -> np.dtype:
    return np.dtype(as_jax_dtype(dt))


def element_size(dt: DtypeLike) -> int:
    """Bytes per element — must match the reference's on-disk binary layout."""
    return as_numpy_dtype(dt).itemsize


def is_floating(dt: DtypeLike) -> bool:
    return jnp.issubdtype(as_jax_dtype(dt), jnp.floating)


def is_integer(dt: DtypeLike) -> bool:
    return jnp.issubdtype(as_jax_dtype(dt), jnp.integer)

"""Framework interop (torch / numpy / dlpack).

Analog of the reference's torch binding surface (reference:
python torch/utils.py + dlpack_utils.py dtype/tensor converters and the
dlpack exports in wholememory_binding.pyx).  The reference is a *torch*
library; this framework is jax-native, so interop is one-way bridges for
users migrating data pipelines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def from_torch(t):
    """torch.Tensor (cpu) → jax array, zero-copy via dlpack when possible."""
    try:
        return jnp.from_dlpack(t)
    except Exception:
        return jnp.asarray(t.detach().cpu().numpy())


def to_torch(x):
    """jax array → torch.Tensor (cpu)."""
    import torch

    try:
        return torch.from_dlpack(x)
    except Exception:
        return torch.from_numpy(np.asarray(jax.device_get(x)))


_TORCH_DTYPE_NAMES = {
    "float32": "float32",
    "float16": "float16",
    "bfloat16": "bfloat16",
    "float64": "float64",
    "int8": "int8",
    "int16": "int16",
    "int32": "int32",
    "int64": "int64",
    "uint8": "uint8",
}


def torch_dtype_to_jax(dt):
    """torch dtype → jax dtype (torch/utils.py dtype mapper analog)."""
    name = str(dt).replace("torch.", "")
    if name not in _TORCH_DTYPE_NAMES:
        raise ValueError(f"unsupported torch dtype {dt}")
    return jnp.dtype(_TORCH_DTYPE_NAMES[name]).type


def jax_dtype_to_torch(dt):
    import torch

    return getattr(torch, np.dtype(dt).name)

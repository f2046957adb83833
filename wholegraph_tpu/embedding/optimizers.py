"""Sparse (row-wise) embedding optimizers.

TPU-native replacement for the reference's embedding optimizer family
(reference: cpp/src/wholememory/embedding_optimizer.{hpp,cpp} and the per-row
step kernels in cpp/src/wholememory_ops/functions/embedding_optimizer_func.cu:
sgd :179, lazy_adam :332, ada_grad :595, rms_prop :792).  Each optimizer
updates ONLY the rows touched by the current mini-batch ("lazy" semantics):
the update function receives the touched parameter rows, their deduplicated
gradients, and the touched rows of each state slot, and returns new rows —
the caller scatters them back into the sharded table/slots.

All math is pure jnp on ``[B, D]`` row blocks so it fuses into the
scatter/gather pipeline under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Slots = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class SparseOptimizer:
    """Base class: a named set of per-row state slots + a row-block update.

    Mirrors embedding_optimizer_impl_base (embedding_optimizer.hpp:83-123):
    ``slot_names`` corresponds to the reference's per-embedding optimizer
    state tensors, and :meth:`update` to the per-row step kernel.
    """

    name: str = "base"

    @property
    def slot_names(self) -> Tuple[str, ...]:
        return ()

    def update(
        self, rows: Array, grads: Array, slots: Slots, step: Array, lr
    ) -> Tuple[Array, Slots]:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class SGD(SparseOptimizer):
    """SGD with optional weight decay (SGDEmbeddingOptimizer,
    embedding_optimizer.cpp:100; kernel embedding_optimizer_func.cu:179)."""

    weight_decay: float = 0.0
    name: str = "sgd"

    def update(self, rows, grads, slots, step, lr):
        g = grads + self.weight_decay * rows
        return rows - lr * g, slots


@dataclasses.dataclass(frozen=True)
class LazyAdam(SparseOptimizer):
    """Lazy Adam / AdamW (reference embedding_optimizer.cpp:193-260; kernel
    embedding_optimizer_func.cu:332).  Bias correction uses the global step
    count; m/v are updated only for touched rows (lazy)."""

    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    weight_decay: float = 0.0
    adam_w: bool = False
    name: str = "lazy_adam"

    @property
    def slot_names(self):
        return ("m", "v")

    def update(self, rows, grads, slots, step, lr):
        t = step.astype(rows.dtype)
        if self.adam_w:
            g = grads
        else:
            g = grads + self.weight_decay * rows
        m = self.beta1 * slots["m"] + (1.0 - self.beta1) * g
        v = self.beta2 * slots["v"] + (1.0 - self.beta2) * g * g
        mhat = m / (1.0 - jnp.power(self.beta1, t))
        vhat = v / (1.0 - jnp.power(self.beta2, t))
        upd = mhat / (jnp.sqrt(vhat) + self.epsilon)
        if self.adam_w:
            upd = upd + self.weight_decay * rows
        return rows - lr * upd, {"m": m, "v": v}


@dataclasses.dataclass(frozen=True)
class RMSProp(SparseOptimizer):
    """RMSProp (embedding_optimizer.cpp:413-466; kernel :792)."""

    alpha: float = 0.99
    epsilon: float = 1e-8
    weight_decay: float = 0.0
    name: str = "rms_prop"

    @property
    def slot_names(self):
        return ("v",)

    def update(self, rows, grads, slots, step, lr):
        g = grads + self.weight_decay * rows
        v = self.alpha * slots["v"] + (1.0 - self.alpha) * g * g
        return rows - lr * g / (jnp.sqrt(v) + self.epsilon), {"v": v}


@dataclasses.dataclass(frozen=True)
class AdaGrad(SparseOptimizer):
    """AdaGrad (embedding_optimizer.cpp:310-363; kernel :595)."""

    epsilon: float = 1e-8
    weight_decay: float = 0.0
    name: str = "ada_grad"

    @property
    def slot_names(self):
        return ("state_sum",)

    def update(self, rows, grads, slots, step, lr):
        g = grads + self.weight_decay * rows
        s = slots["state_sum"] + g * g
        return rows - lr * g / (jnp.sqrt(s) + self.epsilon), {"state_sum": s}


_REGISTRY = {
    "sgd": SGD,
    "lazy_adam": LazyAdam,
    "adam": LazyAdam,
    "rms_prop": RMSProp,
    "rmsprop": RMSProp,
    "ada_grad": AdaGrad,
    "adagrad": AdaGrad,
}


def create_optimizer(name: str, **hyper) -> SparseOptimizer:
    """Factory by name (wholememory_create_embedding_optimizer analog,
    optimizer type enum embedding.h:60-66)."""
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown optimizer {name!r}; have {sorted(set(_REGISTRY))}")
    return _REGISTRY[key](**hyper)

"""Fused Pallas neighborhood-aggregation kernel (padded SpMM).

Computes ``out[i] = sum_k x[nbr[i, k]]`` in one pass: neighbor rows stream
HBM→VMEM through a deep DMA ring and accumulate on the VPU, writing each
destination row once.  Compared to gather-then-reduce this removes the
[B, K, D] intermediate (the reference fuses the same way in cuGraph-Ops'
agg_concat_n2n; SURVEY §2.2 P10).

Masking: callers map masked slots to sentinel index U (one past the last
row); the kernel skips both the DMA and the accumulate for sentinel slots,
so padding costs no descriptors.  Mean division happens outside.

Mosaic layout rules: x viewed [U, D//128, 128]; the SMEM neighbor block must
be 1024-aligned, so K is padded to a power of two and the per-step row count
rb chosen as 1024 / K_pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _agg_kernel(nbr_ref, x_ref, out_ref, scratch, sems, *, rb: int, K: int, n_inflight: int, U: int):
    total = rb * K

    def dma(j):
        return pltpu.make_async_copy(
            x_ref.at[jnp.minimum(nbr_ref[j], U - 1)],
            scratch.at[j % n_inflight],
            sems.at[j % n_inflight],
        )

    out_ref[...] = jnp.zeros_like(out_ref)

    def acc(j):
        @pl.when(nbr_ref[j] < U)
        def _():
            dma(j).wait()
            r = j // K
            out_ref[r, :, :] += scratch[j % n_inflight]

    def issue(j, _):
        @pl.when(j >= n_inflight)
        def _a():
            acc(j - n_inflight)

        @pl.when(nbr_ref[j] < U)
        def _s():
            dma(j).start()

        return 0

    lax.fori_loop(0, total, issue, 0, unroll=True)

    def drain(k, _):
        acc(total - n_inflight + k)
        return 0

    lax.fori_loop(0, n_inflight, drain, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("rb", "n_inflight"))
def _padded_sum_pallas(x: Array, nbr: Array, *, rb: int, n_inflight: int = 128) -> Array:
    """out[i] = sum over k of x[nbr[i, k]] for nbr < U (sentinel U skipped).

    x: [U, D]; nbr: [B, K] int32 in [0, U]; B % rb == 0; rb*K % 1024 == 0.
    """
    B, K = nbr.shape
    U, D = x.shape
    assert D % 128 == 0 and B % rb == 0 and (rb * K) % 1024 == 0
    d0 = D // 128
    out3 = pl.pallas_call(
        functools.partial(_agg_kernel, rb=rb, K=K, n_inflight=n_inflight, U=U),
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((rb * K,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rb, d0, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d0, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_inflight, d0, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((n_inflight,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(nbr.reshape(B * K).astype(jnp.int32), x.reshape(U, d0, 128).astype(jnp.float32))
    return out3.reshape(B, D)


def _next_pow2(k: int) -> int:
    p = 1
    while p < k:
        p *= 2
    return p


def padded_reduce_pallas(x: Array, nbr_idx: Array, mask: Array, reduce: str = "mean") -> Array:
    """Drop-in for ops.spmm.padded_reduce (sum/mean) on TPU."""
    U, D = x.shape
    B, K = nbr_idx.shape
    K_pad = min(_next_pow2(max(K, 1)), 1024)
    rb = max(1024 // K_pad, 1)
    nbr = jnp.where(mask, jnp.clip(nbr_idx, 0, U - 1), U).astype(jnp.int32)
    if K_pad != K:
        nbr = jnp.concatenate(
            [nbr, jnp.full((B, K_pad - K), U, jnp.int32)], axis=1
        )
    pad_b = -B % rb
    if pad_b:
        nbr = jnp.concatenate([nbr, jnp.full((pad_b, K_pad), U, jnp.int32)])
    out = _padded_sum_pallas(x.astype(jnp.float32), nbr, rb=rb)[:B]
    if reduce == "mean":
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1).astype(out.dtype)
        out = out / cnt
    elif reduce != "sum":
        raise ValueError(f"padded_reduce_pallas supports sum/mean, not {reduce!r}")
    return out.astype(x.dtype)

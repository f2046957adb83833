"""Fused padded-neighborhood aggregation kernel (SpMM v2).

TPU-native replacement for cuGraph-Ops' fused neighborhood aggregation
(reference: torch/cugraphops/sage_conv.py:73-95 ``agg_concat_n2n``).  The
unfused path (ops/spmm.py gather → HBM → masked K-reduce) moves every
neighbor row through HBM three times (gather write, reduce read, plus the
original read); this kernel reads each row from HBM exactly ONCE:

  per center-block of C centers (grid step):
    software-pipelined DMA ring fetches 8-row tiles (the k-th neighbor of 8
    consecutive centers → one [8, D] VMEM tile = full sublanes for the VPU
    accumulate) and accumulates ``out[8 rows] += tile`` in VMEM.

Masked slots skip their DMA entirely (their tile row is zero-filled
instead), so HBM traffic is proportional to REAL edges, not the padded B*K.

Ceiling math (v5e, measured in scripts/exp_gather_desc*.py): row fetches
are DMA-descriptor-bound at ~8 ns/row regardless of semaphore strategy,
ring depth, or priority queues, so at D=256 fp32 the kernel's ceiling is
~125 M edges/s (1 KB/edge · 8 ns) — the fusion removes the 2 extra HBM
passes vs gather+reduce, and only multi-row descriptors could go further.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _fused_agg_kernel(
    ids_ref,  # SMEM [C, K] int32; masked slots point at the appended ZERO row
    x_ref,  # ANY  [N+1, d0, 128] (last row is all-zero)
    out_ref,  # VMEM [C, d0, 128] f32 accumulator (block output)
    bufs,  # VMEM scratch [2, K, 8, d0, 128] (double-buffered sub-groups)
    sems,  # DMA sems [2, K, 8]
    *,
    C: int,
    K: int,
):
    # Tuned by measurement (v5e): every DMA is UNCONDITIONAL — masked slots
    # fetch the zero row (per-row pl.when guards cost ~15 ns/row of scalar
    # branching: 45 Medges/s) — and the accumulate is ONE K-axis reduction
    # per 8-center sub-group instead of one add per tile (per-tile vector
    # statements cost ~4 ns/row of scalar-vector sync: 84 Medges/s).
    G = C // 8  # 8-center sub-groups per block

    def row_dma(s, k, r):
        idx = ids_ref[s * 8 + r, k]
        return pltpu.make_async_copy(
            x_ref.at[idx], bufs.at[s % 2, k, r], sems.at[s % 2, k, r]
        )

    def issue(s):
        for k in range(K):
            for r in range(8):
                row_dma(s, k, r).start()

    def wait_reduce(s):
        for k in range(K):
            for r in range(8):
                row_dma(s, k, r).wait()
        # [K, 8, d0, 128] -> [8, d0, 128]: a single traced reduction
        out_ref[s * 8 : (s + 1) * 8] = jnp.sum(bufs[s % 2], axis=0)

    issue(0)
    if G > 1:
        issue(1)
    for s in range(G):
        wait_reduce(s)
        if s + 2 < G:
            issue(s + 2)


@functools.partial(jax.jit, static_argnames=("block_c", "ring"))
def _fused_padded_sum_impl(
    x: Array, ids: Array, *, block_c: int = 64, ring: int = 32
) -> Array:
    """sum_k x[ids[b,k]] → [B, D] f32.  ``x`` must carry an all-zero LAST
    row; masked slots point at it.  B must be a multiple of block_c; D a
    multiple of 128."""
    B, K = ids.shape
    N1, D = x.shape
    assert D % 128 == 0 and B % block_c == 0 and block_c % 8 == 0
    d0 = D // 128
    del ring
    out3 = pl.pallas_call(
        functools.partial(_fused_agg_kernel, C=block_c, K=K),
        grid=(B // block_c,),
        in_specs=[
            pl.BlockSpec((block_c, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_c, d0, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, d0, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K, 8, d0, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, K, 8)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.astype(jnp.int32), x.reshape(N1, d0, 128))
    return out3.reshape(B, D)


def _fused_sum_fwd_padded(x, nbr_idx, mask):
    """Append the zero row, route masked slots to it, pad B, run the kernel."""
    B, K = nbr_idx.shape
    N, D = x.shape
    block_c = 64
    xz = jnp.concatenate([x.astype(jnp.float32), jnp.zeros((1, D), jnp.float32)])
    ids = jnp.where(mask, jnp.clip(nbr_idx.astype(jnp.int32), 0, N - 1), N)
    pad = -B % block_c
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad, K), N, jnp.int32)])
    out = _fused_padded_sum_impl(xz, ids, block_c=block_c)
    return out[:B].astype(x.dtype) if pad else out.astype(x.dtype)


@jax.custom_vjp
def fused_padded_sum(x: Array, nbr_idx: Array, mask: Array) -> Array:
    """Fused masked neighborhood SUM: out[b] = Σ_k mask[b,k]·x[nbr_idx[b,k]].

    Single-HBM-pass pallas kernel on TPU (see module docstring); the VJP is
    the scatter-add of the output cotangent over the edges — identical math
    to the unfused path's autodiff."""
    return _fused_sum_fwd_padded(x, nbr_idx, mask)


def _fps_fwd(x, nbr_idx, mask):
    # NB: residuals must be JAX types (no dtype objects) — the out/ct dtype
    # equals x's dtype (fwd casts), so the bwd derives it from ct.
    return _fused_sum_fwd_padded(x, nbr_idx, mask), (x.shape, nbr_idx, mask)


def _fps_bwd(res, ct):
    (N, D), nbr_idx, mask = res
    dtype = ct.dtype
    B, K = nbr_idx.shape
    flat = jnp.where(mask, nbr_idx, N).reshape(-1)
    ct_edges = jnp.broadcast_to(ct[:, None, :], (B, K, D)).reshape(B * K, D)
    dx = (
        jnp.zeros((N, D), jnp.float32)
        .at[flat]
        .add(jnp.where(mask.reshape(-1, 1), ct_edges, 0), mode="drop")
        .astype(dtype)
    )
    return dx, None, None


fused_padded_sum.defvjp(_fps_fwd, _fps_bwd)

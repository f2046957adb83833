"""Diagnose the fused-SpMM gap: is HBM->VMEM descriptor rate lower than
HBM->HBM (~8 ns/row), or does the accumulate serialize?

  A  noacc   : v2 ring, DMA HBM->VMEM only, no accumulate (pure desc rate)
  B  acc4    : accumulate every 4th tile only (1/4 the vector statements)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/exp_spmm_diag.py > /tmp/exp_spmm_diag.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(ids_ref, x_ref, out_ref, tiles, sems, *, C, K, R, mode):
    G = C // 8
    T = G * K

    def row_dma(t, r):
        s, k = divmod(t, K)
        idx = ids_ref[s * 8 + r, k]
        return pltpu.make_async_copy(
            x_ref.at[idx], tiles.at[t % R, r], sems.at[t % R, r]
        )

    def issue(t):
        for r in range(8):
            row_dma(t, r).start()

    def wait_accum(t):
        s, k = divmod(t, K)
        for r in range(8):
            row_dma(t, r).wait()
        if mode == "noacc":
            return
        if mode == "acc4" and (k % 4) != 0:
            return
        if k == 0:
            out_ref[s * 8 : (s + 1) * 8] = tiles[t % R]
        else:
            out_ref[s * 8 : (s + 1) * 8] += tiles[t % R]

    for t in range(min(R, T)):
        issue(t)
    for t in range(T):
        wait_accum(t)
        if t + R < T:
            issue(t + R)
    if mode == "noacc":
        out_ref[0:8] = tiles[0]  # keep tiles live


def build(mode, N, D, B, K, block_c=64, ring=32):
    d0 = D // 128

    @jax.jit
    def run(x3, ids):
        return pl.pallas_call(
            functools.partial(kern, C=block_c, K=K, R=ring, mode=mode),
            grid=(B // block_c,),
            in_specs=[
                pl.BlockSpec((block_c, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((block_c, d0, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, d0, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((ring, 8, d0, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((ring, 8)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids, x3)

    return run


def main():
    N, D, B, K = 1 << 17, 256, 1 << 16, 16
    print("dev:", jax.devices(), flush=True)
    x3 = jax.jit(lambda: jnp.zeros((N, D // 128, 128), jnp.float32))()
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, K), 0, N, dtype=jnp.int32)

    for mode in ["noacc", "acc4"]:
        try:
            run = build(mode, N, D, B, K)

            @jax.jit
            def chain(x3, ids, n):
                def body(i, acc):
                    out = run(x3, ids + (i % 2))
                    return acc + out[0, 0, 0]

                return lax.fori_loop(0, n, body, jnp.float32(0))

            t0 = time.perf_counter()
            float(chain(x3, ids, 1))
            print(f"[{mode}] compile {time.perf_counter()-t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            float(chain(x3, ids, 1))
            base = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain(x3, ids, 9))
            dt = max((time.perf_counter() - t0 - base) / 8, 1e-9)
            E = B * K
            print(f"[{mode}] {E/dt/1e6:.1f} Medges/s ({dt/E*1e9:.2f} ns/row)", flush=True)
        except Exception as e:
            print(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()

"""TPU experiment round 3: python-unrolled loops so per-copy constants
(priority, slot) are concrete.

  D2 priority alternation (python unroll)
  E2 dual rings, no priority (python unroll)
  H  id_block=2048 with n_inflight=256

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/exp_gather_desc3.py > /tmp/exp_gather3.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ring_py(ids_ref, table_ref, out_ref, sems, *, id_block, n_inflight, alt_priority):
    nb = pl.program_id(0)
    base = nb * id_block

    def dma(j):
        idx = ids_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[base + j], sems.at[j % n_inflight]
        )

    for j in range(id_block):
        if j >= n_inflight:
            dma(j - n_inflight).wait()
        if alt_priority:
            dma(j).start(priority=j % 2)
        else:
            dma(j).start()

    for k in range(n_inflight):
        dma(id_block - n_inflight + k).wait()


def dual_ring_py(ids_ref, table_ref, out_ref, semA, semB, *, id_block, n_inflight):
    nb = pl.program_id(0)
    base = nb * id_block
    half = id_block // 2

    def dmaA(j):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[j]], out_ref.at[base + j], semA.at[j % n_inflight]
        )

    def dmaB(j):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[half + j]], out_ref.at[base + half + j],
            semB.at[j % n_inflight],
        )

    for j in range(half):
        if j >= n_inflight:
            dmaA(j - n_inflight).wait()
            dmaB(j - n_inflight).wait()
        dmaA(j).start()
        dmaB(j).start()

    for k in range(n_inflight):
        dmaA(half - n_inflight + k).wait()
        dmaB(half - n_inflight + k).wait()


def build(variant, N, D, B):
    d0 = D // 128
    id_block = 1024
    if variant == "D2":
        kern = functools.partial(
            ring_py, id_block=id_block, n_inflight=256, alt_priority=True
        )
        scratch = [pltpu.SemaphoreType.DMA((256,))]
    elif variant == "E2":
        kern = functools.partial(dual_ring_py, id_block=id_block, n_inflight=224)
        scratch = [pltpu.SemaphoreType.DMA((224,)), pltpu.SemaphoreType.DMA((224,))]
    elif variant == "H":
        id_block = 2048
        kern = functools.partial(
            ring_py, id_block=id_block, n_inflight=256, alt_priority=False
        )
        scratch = [pltpu.SemaphoreType.DMA((256,))]
    else:
        raise ValueError(variant)

    @jax.jit
    def run(table3, ids):
        return pl.pallas_call(
            kern,
            grid=(B // id_block,),
            in_specs=[
                pl.BlockSpec((id_block,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, d0, 128), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ids, table3)

    return run


def timeit(run, table3, ids, B, D, iters=8):
    @jax.jit
    def chain(t, ids, n):
        def body(i, acc):
            out = run(t, ids + (i % 2))
            return acc + out[0, 0, 0]

        return lax.fori_loop(0, n, body, jnp.float32(0))

    float(chain(table3, ids, 1))
    t0 = time.perf_counter()
    float(chain(table3, ids, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(table3, ids, 1 + iters))
    full = time.perf_counter() - t0
    dt = max((full - base) / iters, 1e-9)
    return B * D * 4 / dt / 1e9, dt


def main():
    N, D, B = 4_000_000, 256, 1 << 19
    print(f"devices: {jax.devices()}", flush=True)
    table3 = jax.jit(lambda: jnp.zeros((N, D // 128, 128), jnp.float32))()
    ids = jax.random.randint(jax.random.PRNGKey(0), (B,), 0, N - 2, dtype=jnp.int32)

    Ns, Bs = 100_000, 4096
    ts = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (Ns, D)).astype(jnp.float32)
    )()
    ids_s = jax.random.randint(jax.random.PRNGKey(2), (Bs,), 0, Ns, dtype=jnp.int32)
    want = jnp.take(ts, ids_s, axis=0)

    for variant in ["D2", "E2", "H"]:
        try:
            t0 = time.perf_counter()
            run_s = build(variant, Ns, D, Bs)
            got = run_s(ts.reshape(Ns, D // 128, 128), ids_s).reshape(Bs, D)
            ok = bool(jnp.all(got == want))
            print(
                f"[{variant}] small correctness: {ok} (compile {time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
            if not ok:
                continue
            run = build(variant, N, D, B)
            gbps, dt = timeit(run, table3, ids, B, D)
            print(
                f"[{variant}] {gbps:.1f} GB/s  ({dt*1e3:.2f} ms, {dt/B*1e9:.2f} ns/row)",
                flush=True,
            )
        except Exception as e:
            print(f"[{variant}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

"""TPU experiment 4: grouped window gather with PER-SUB-TILE dynamic starts.

exp3's grouped kernel sizes wsub for the CUMULATIVE drift of the last
sub-tile (g*tile*(1/d-1)), so the one-hot matmul cost explodes as density
drops (d=0.82: 91 GB/s, MXU-bound).  Here each sub-tile g slices the shared
step window at its OWN first id (dynamic VMEM offset aligned down to 32),
so wsub only covers the within-sub-tile span (~tile/d + noise) at ANY
density, and the fetch ratio is ~1/d:

  rows_g = onehot(ids_g - (w0 + s_g)) @ win[slot, ds(s_g, wsub), :]

Sweep density x (tile, wsub, group) at N=4M D=256 f32, B=512K.

Run: nohup PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_window_gather4.py > /tmp/exp_window5.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wholegraph_tpu.utils.perf import measure_chain

WALIGN = 32
N = 4_000_000
D = 256
B = 1 << 19


def kernel(
    w0s_ref, starts_ref, ids_ref, table_ref, out_ref, win, sems,
    *, tile, wsub, group, window, nt,
):
    t = pl.program_id(0)

    def copy(slot, tt):
        w0 = pl.multiple_of(w0s_ref[tt], WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0, window), :], win.at[slot], sems.at[slot]
        )

    @pl.when(t == 0)
    def _first():
        copy(0, 0).start()

    @pl.when(t + 1 < nt)
    def _pre():
        copy((t + 1) % 2, t + 1).start()

    slot = t % 2
    copy(slot, t).wait()
    w0 = w0s_ref[t]
    dtype = out_ref.dtype

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    for g in range(group):
        base = g * tile
        s_g = pl.multiple_of(starts_ref[t * group + g], WALIGN)
        ids_g = ids_ref[base:base + tile, :]
        wslice = win[slot, pl.ds(s_g, wsub), :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, wsub), 1)
        oh = (ids_g - (w0 + s_g) == col).astype(jnp.bfloat16)
        if dtype == jnp.bfloat16:
            rows = bdot(oh, wslice)
        else:
            hi = wslice.astype(jnp.bfloat16)
            r = wslice - hi.astype(jnp.float32)
            mid = r.astype(jnp.bfloat16)
            lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            rows = bdot(oh, hi) + bdot(oh, mid) + bdot(oh, lo)
        out_ref[base:base + tile, :] = rows.astype(dtype)


@functools.partial(jax.jit, static_argnames=("tile", "wsub", "group", "window"))
def gather_dyn(table, ids, *, tile, wsub, group, window):
    Bn = ids.shape[0]
    Nr, Dd = table.shape
    step = tile * group
    assert window % WALIGN == 0 and Bn % step == 0
    nt = Bn // step
    nmax = (Nr - window) // WALIGN * WALIGN
    w0s = jnp.clip(ids[::step] // WALIGN * WALIGN, 0, nmax)
    # per-sub-tile start within the step window, aligned down, clamped so the
    # wsub slice stays inside the window
    firsts = ids[::tile].reshape(nt, group)
    starts = (firsts - w0s[:, None]) // WALIGN * WALIGN
    starts = jnp.clip(starts, 0, window - wsub).reshape(-1).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            kernel, tile=tile, wsub=wsub, group=group, window=window, nt=nt
        ),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((step, 1), lambda t: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((step, Dd), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Bn, Dd), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, window, Dd), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, starts, ids.reshape(Bn, 1), table)


def sorted_ids(rng, density, batch, n=N):
    span = int(batch / density)
    start = rng.randint(0, n - span)
    ids = start + rng.choice(span, batch, replace=False)
    ids.sort()
    return jnp.asarray(ids.astype(np.int32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    # correctness: dense + miss accounting vs take
    tab = jax.jit(
        lambda: (jax.random.normal(jax.random.PRNGKey(1), (200_000, D)) * 50)
    )()
    idsc = sorted_ids(rng, 0.8, 8192, n=200_000)
    got = gather_dyn(tab, idsc, tile=128, wsub=192, group=8, window=2048)
    ref = jnp.take(tab, idsc, axis=0)
    nz = np.asarray(got != 0).any(axis=1)
    ok = np.array_equal(np.asarray(got)[nz], np.asarray(ref)[nz])
    print(f"correct: bitexact_inwin={ok} covered={nz.mean():.5f}", flush=True)

    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()

    for d in (0.95, 0.82, 0.5, 0.3):
        step_span = lambda step: int(step / d * 1.25) // WALIGN * WALIGN + WALIGN
        for tile, wsub, group in ((128, 192, 8), (128, 224, 8), (128, 192, 16), (256, 320, 8)):
            step = tile * group
            window = max(step_span(step), wsub + WALIGN)
            ids_list = [sorted_ids(rng, d, B) for _ in range(4)]

            def stp(i, tb):
                ids = jax.lax.switch(
                    i % len(ids_list), [lambda x=x: x for x in ids_list]
                )
                return gather_dyn(
                    tb, ids, tile=tile, wsub=wsub, group=group, window=window
                )[0, 0]

            try:
                dt = measure_chain(stp, 8, table)
                # coverage on one list
                o = gather_dyn(
                    table, ids_list[0], tile=tile, wsub=wsub, group=group,
                    window=window,
                )
                cov = float(np.asarray((o != 0).any(axis=1)).mean())
                print(
                    f"DYN d={d} t={tile} wsub={wsub} g={group} win={window}: "
                    f"{B*D*4/dt/1e9:.1f} GB/s ({dt*1e3:.2f} ms) cov={cov:.5f}",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"DYN d={d} t={tile} wsub={wsub} g={group}: FAIL "
                    f"...{str(e)[-200:]}",
                    flush=True,
                )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""TPU experiment: int8 4-plane one-hot select vs 3-pass bf16 for f32 rows.

The windowed gather's f32 select does 3 bf16 MXU passes (197 Tflops peak).
v5e's MXU does s8xs8->s32 at 2x that rate, so selecting the 4 BYTE planes of
the f32 window with an int8 one-hot (4 passes at 2x = 2 bf16-equivalents)
should be ~1.5x cheaper, and is exact BITWISE:

  w_i32 = bitcast(win, int32)
  plane_k = ((w_i32 >> 8k) & 0xFF) - 128          (fits int8)
  sel_k   = onehot_i8 @ plane_k + 128 * hit       (hit = row has a match)
  y_i32   = sum_k sel_k << 8k ; out = bitcast(y_i32, f32)

Checks: (a) does Mosaic lower int8 dot_general with preferred int32?
(b) bit-exactness vs take; (c) rate vs the bf16 3-pass kernel at the bench
shape (d=0.8, N=4M, D=256, B=512K).

Run: nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_int8_select.py > /tmp/exp_int8.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wholegraph_tpu.ops.gather_pallas import _window_starts
from wholegraph_tpu.utils.perf import measure_chain

WALIGN = 32
N, D, B = 4_000_000, 256, 1 << 19


def kernel(w0s_ref, starts_ref, ids_ref, table_ref, out_ref, win, sems,
           *, tile, wsub, group, window, nt, mode):
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

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def idot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    for g in range(group):
        base = g * tile
        s_g = pl.multiple_of(starts_ref[t * group + g], WALIGN)
        ids_g = ids_ref[base:base + tile, :]
        wslice = win[slot, pl.ds(s_g, wsub), :]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, wsub), 1)
        match = ids_g - (w0 + s_g) == col
        if mode == "bf16":
            onehot = match.astype(jnp.bfloat16)
            hi = wslice.astype(jnp.bfloat16)
            r = wslice - hi.astype(jnp.float32)
            mid = r.astype(jnp.bfloat16)
            lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            rows = bdot(onehot, hi) + bdot(onehot, mid) + bdot(onehot, lo)
            out_ref[base:base + tile, :] = rows
        else:
            oh8 = match.astype(jnp.int8)
            hit = match.any(axis=1, keepdims=True)  # [tile, 1]
            w_i32 = jax.lax.bitcast_convert_type(wslice, jnp.int32)
            acc = jnp.zeros((tile, D), jnp.int32)
            for k in range(4):
                plane = (((w_i32 >> (8 * k)) & 0xFF) - 128).astype(jnp.int8)
                sel = idot(oh8, plane) + jnp.where(hit, 128, 0)
                acc = acc | ((sel & 0xFF) << (8 * k))
            out_ref[base:base + tile, :] = jax.lax.bitcast_convert_type(acc, jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "wsub", "group", "window", "mode"))
def gather_win(table, ids, *, tile, wsub, group, window, mode):
    Bn = ids.shape[0]
    Nr, Dd = table.shape
    step = tile * group
    nt = Bn // step
    w0s, starts = _window_starts(ids.astype(jnp.int32), Nr, tile, window, group, wsub)
    return pl.pallas_call(
        functools.partial(kernel, tile=tile, wsub=wsub, group=group,
                          window=window, nt=nt, mode=mode),
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
    )(w0s, starts, ids.astype(jnp.int32).reshape(Bn, 1), table)


def sorted_ids(rng, density, batch, n=N):
    span = min(n, int(batch / density))
    start = rng.randint(0, n - span + 1)
    ids = start + rng.choice(span, batch, replace=False)
    ids.sort()
    return jnp.asarray(ids.astype(np.int32))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    # correctness vs take (covered rows only; includes negatives, NaN bits)
    Nc = 200_000
    tab = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (Nc, D)) * 1e3
    )()
    ids = sorted_ids(rng, 0.8, 8192, n=Nc)
    ref = np.asarray(jnp.take(tab, ids, axis=0))
    for mode in ("int8", "bf16"):
        try:
            got = np.asarray(gather_win(tab, ids, tile=128, wsub=224, group=8,
                                        window=1376, mode=mode))
            nz = (got != 0).any(axis=1)
            print(f"{mode}: bitexact_covered={np.array_equal(got[nz], ref[nz])} "
                  f"cov={nz.mean():.5f}", flush=True)
        except Exception as e:
            print(f"{mode}: FAIL ...{str(e)[-300:]}", flush=True)
            if mode == "int8":
                return

    table = jax.jit(lambda: jnp.ones((N, D), jnp.float32))()
    for mode in ("bf16", "int8"):
        for d, win in ((0.8, 1376), (0.95, 1216)):
            ids_list = [sorted_ids(rng, d, B) for _ in range(4)]

            def stp(i, tb):
                idx = jax.lax.switch(i % 4, [lambda x=x: x for x in ids_list])
                return gather_win(tb, idx, tile=128, wsub=224, group=8,
                                  window=win, mode=mode)[0, 0]

            try:
                dt = measure_chain(stp, 8, table)
                print(f"{mode} d={d}: {B*D*4/dt/1e9:.1f} GB/s ({dt*1e3:.2f} ms)",
                      flush=True)
            except Exception as e:
                print(f"{mode} d={d}: FAIL ...{str(e)[-200:]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

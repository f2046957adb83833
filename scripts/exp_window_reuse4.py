"""Round-4 window ladder part 4: where is the fetch floor?

  - honest XLA copy calibration (optimization_barrier, no DCE)
  - window fetch with a TINY output block (isolates pure slab-read rate
    from the read+write aggregate)
  - single-DMA whole-slab vs split, 1408 vs 2816 window

  nohup env PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site python \
    scripts/exp_window_reuse4.py > /tmp/exp_reuse4.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_window_reuse import make_plane_table
from wholegraph_tpu.ops.gather_pallas import _WALIGN, _window_starts
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 6


def _fetch_tiny_kernel(w0s_ref, table_ref, out_ref, win, sems,
                       *, window, nt, splits, slots):
    t = pl.program_id(0)
    sub = window // splits

    def copy(slot, tt, s):
        w0 = pl.multiple_of(w0s_ref[tt], _WALIGN)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(w0 + s * sub, sub), :],
            win.at[slot, pl.ds(s * sub, sub), :],
            sems.at[slot, s],
        )

    @pl.when(t == 0)
    def _first():
        for la in range(slots - 1):
            for s in range(splits):
                copy(la, la, s).start()

    @pl.when(t + slots - 1 < nt)
    def _pref():
        for s in range(splits):
            copy((t + slots - 1) % slots, t + slots - 1, s).start()

    slot = t % slots
    for s in range(splits):
        copy(slot, t, s).wait()
    out_ref[...] = (win[slot, 0:8, 0:128]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("window", "splits", "slots", "step"))
def fetch_tiny(table, ids, *, window=1408, splits=1, slots=2, step=1024):
    n = table.shape[0]
    Bp = ids.shape[0]
    nt = Bp // step
    w0s, _ = _window_starts(ids.astype(jnp.int32), n, 128, window, step // 128,
                            224)
    out = pl.pallas_call(
        functools.partial(_fetch_tiny_kernel, window=window, nt=nt,
                          splits=splits, slots=slots),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((nt * 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slots, window, table.shape[1]), table.dtype),
            pltpu.SemaphoreType.DMA((slots, splits)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w0s, table)
    return out


def run(tag, fn, *args, bytes_moved):
    try:
        dts = sorted(measure_chain(fn, iters, *args) for _ in range(3))
        gb = bytes_moved / dts[1] / 1e9
        print(f"{tag}: {gb:.1f} GB/s-moved "
              f"[{', '.join(f'{x*1e3:.2f}' for x in dts)} ms]", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    table = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (N, D), jnp.float32)
    )()
    planes = jax.jit(make_plane_table)(table)
    d = 0.8
    span = int(B / d)
    lists = [
        jnp.asarray(np.sort(b + rng.choice(span, B, replace=False)).astype(np.int32))
        for b in rng.randint(0, N - span, size=6)
    ]

    M = (1 << 29) // (D * 4)

    def copy_step(i, tab):
        sl = lax.dynamic_slice(tab, ((i % 4) * 1024, 0), (M, D))
        out = lax.optimization_barrier(sl * 1.0000001)
        return out[0, 0]

    run("XLA copy 512MB (r+w = 1GB)", copy_step, table, bytes_moved=1 << 30)

    def mk(**kw):
        def step(i, tab):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fetch_tiny(tab, ids, **kw)[0, 0]
        return step

    fetch_bytes = (B // 1024) * 1408 * 1024  # nt * window * rowbytes
    run("pure fetch win1408 split1", mk(window=1408), planes,
        bytes_moved=fetch_bytes)
    run("pure fetch win1408 split4", mk(window=1408, splits=4), planes,
        bytes_moved=fetch_bytes)
    run("pure fetch win1408 split4 slots4", mk(window=1408, splits=4, slots=4),
        planes, bytes_moved=fetch_bytes)
    run("pure fetch f32 win1408 split1", mk(window=1408), table,
        bytes_moved=fetch_bytes)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

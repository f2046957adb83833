"""spmm_window hardware debug (round 4).

The r4 validation sweep failed test_spmm_window_matches_segment_sum_tpu
numerically ON TPU (interpret mode passes).  Suspect: the dynamic sublane
slice `rlo_ref[pl.ds(t % 8, 1), :]` used to pick the tile's row from the
(8, T) block.  This script

  1. micro-tests the primitive: dynamic sublane slice vs one-hot masked-sum
     row select on a known [8, 256] block, for every start 0..7;
  2. re-runs a small spmm_window vs segment-sum spmm with per-tile error
     stats (which tiles are wrong, grouped by tile%8).

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_spmm_debug.py > /tmp/exp_spmm_debug.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rowsel_kernel(x_ref, out_ref, *, mode):
    t = pl.program_id(0)
    if mode == "dyn":
        out_ref[...] = x_ref[pl.ds(t % 8, 1), :]
    else:
        sel = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 0) == (t % 8)
        out_ref[...] = jnp.sum(
            jnp.where(sel, x_ref[...], 0), axis=0, keepdims=True
        ).reshape(1, 256)


@functools.partial(jax.jit, static_argnames=("mode",))
def rowsel(x, *, mode):
    return pl.pallas_call(
        functools.partial(_rowsel_kernel, mode=mode),
        grid=(16,),
        in_specs=[pl.BlockSpec((8, 256), lambda t: (t // 8, 0))],
        out_specs=pl.BlockSpec((1, 256), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.int32),
    )(x)


def micro():
    x = jnp.arange(16 * 256, dtype=jnp.int32).reshape(16, 256)
    want = np.asarray(x)
    for mode in ("onehot", "dyn"):
        try:
            got = np.asarray(rowsel(x, mode=mode))
            ok = (got == want).all()
            if ok:
                print(f"micro {mode}: OK", flush=True)
            else:
                bad = np.nonzero((got != want).any(axis=1))[0]
                # which source row did each bad output actually get?
                srcs = [
                    int(np.nonzero((want == got[b]).all(axis=1))[0][0])
                    if ((want == got[b]).all(axis=1)).any() else -1
                    for b in bad
                ]
                print(f"micro {mode}: WRONG rows {bad.tolist()} "
                      f"(actually returned rows {srcs})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"micro {mode}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def spmm_small():
    from wholegraph_tpu.ops.spmm import plan_spmm_tiles, spmm
    from wholegraph_tpu.ops.spmm_pallas import spmm_window

    rs = np.random.RandomState(0)
    n, deg, dim, width = 20_000, 12, 256, 160
    counts = rs.randint(4, deg, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    x = rs.randn(n, dim).astype(np.float32)
    window, edge_cap, feasible = plan_spmm_tiles(rp, col, tile=256)
    print(f"plan: window={window} edge_cap={edge_cap} feasible={feasible}",
          flush=True)
    edge_dst = np.repeat(np.arange(n), counts).astype(np.int32)
    ref = np.asarray(
        spmm(jnp.asarray(col), jnp.asarray(edge_dst), jnp.asarray(x), n,
             "sum")
    )
    got = np.asarray(
        spmm_window(jnp.asarray(rp), jnp.asarray(col), jnp.asarray(x),
                    window=window, edge_cap=edge_cap, tile=256,
                    reduce="sum")
    )
    err = np.abs(got - ref).max(axis=1)
    bad_rows = np.nonzero(err > 2e-3)[0]
    print(f"spmm sum: max_err={err.max():.3e} bad_rows={bad_rows.size}/{n}",
          flush=True)
    if bad_rows.size:
        tiles = np.unique(bad_rows // 256)
        print(f"  bad tiles ({tiles.size}): first 20 = {tiles[:20].tolist()}",
              flush=True)
        print(f"  bad tile %8 histogram: "
              f"{np.bincount(tiles % 8, minlength=8).tolist()}", flush=True)
    else:
        # confirm mean + weighted too
        w = rs.rand(E).astype(np.float32)
        for reduce, ew in (("mean", None), ("sum", w)):
            r2 = np.asarray(
                spmm(jnp.asarray(col), jnp.asarray(edge_dst), jnp.asarray(x),
                     n, reduce,
                     edge_weight=None if ew is None else jnp.asarray(ew))
            )
            g2 = np.asarray(
                spmm_window(jnp.asarray(rp), jnp.asarray(col), jnp.asarray(x),
                            window=window, edge_cap=edge_cap, tile=256,
                            reduce=reduce,
                            edge_weight=None if ew is None else jnp.asarray(ew))
            )
            e2 = np.abs(g2 - r2).max()
            print(f"spmm {reduce}{' weighted' if ew is not None else ''}: "
                  f"max_err={e2:.3e}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    micro()
    spmm_small()
    print("DONE", flush=True)

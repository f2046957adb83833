"""Host-tier round 11 (VERDICT r3 item 7): push clustered span gathers past
6.7 GB/s.  r3's host_gather_rows_spans uses ~32 KB spans; the host link was
characterized latency-bound at ~16-25 us/descriptor for 4 KB pages, but at
32 KB x 20K descriptors/batch the measured 6.7 GB/s (~4 us/descriptor
effective) is NOT explained by descriptor latency alone — find the real
ceiling:

  - span_bytes ladder: 32K (base) / 64K / 128K / 256K / 1M
  - n_inflight 128 vs 256
  - fetch-only (no device-side take select) at 32K and 256K
  - the take-select alone (device HBM->HBM permute of the staging buffer)

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_host_dma11.py > /tmp/exp_host11.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import SingleDeviceSharding

from wholegraph_tpu.ops.gather_pallas import (
    _host_fetch_chunks,
    _span_plan,
    host_gather_rows_spans,
)
from wholegraph_tpu.utils.perf import measure_chain

N, D, B, iters = 4_000_000, 256, 1 << 19, 5
SPAN_WINDOW = int(B * 1.25)


def med(step, *args):
    return sorted(measure_chain(step, iters, *args) for _ in range(3))[1]


def run(tag, step, *args, bytes_moved=B * D * 4):
    try:
        dt = med(step, *args)
        print(f"{tag}: {bytes_moved / dt / 1e9:.2f} GB/s ({dt*1e3:.1f} ms)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


@functools.partial(jax.jit, static_argnames=("span_rows", "max_spans", "blk",
                                             "n_inflight", "select"))
def spans_fetch(flat, slots, *, span_rows, max_spans, blk, n_inflight,
                select=True):
    fetch_ids, idx_orig, _ = _span_plan(slots, span_rows, max_spans)
    fetched = _host_fetch_chunks(flat, fetch_ids, span_rows * D, blk, n_inflight)
    if not select:
        return fetched.reshape(-1, D)[: slots.shape[0]]
    f2 = fetched.reshape(max_spans * span_rows, D)
    return jnp.take(f2, idx_orig, axis=0, mode="clip")


def geom(span_bytes):
    span_rows = span_bytes // (D * 4)
    need = 2 * -(-B // span_rows)
    if need >= 1024:
        max_spans = -(-need // 1024) * 1024
        blk = 1024
    else:
        blk = 1 << (need - 1).bit_length()
        max_spans = blk
    return span_rows, max_spans, blk


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    flat = jax.device_put(
        jnp.arange(N * D, dtype=jnp.float32).reshape(N, D)[:, :1]
        * jnp.ones((1, D), jnp.float32),
        hs,
    ).reshape(-1)
    flat.block_until_ready()
    rs = np.random.RandomState(0)
    lists = [
        jnp.asarray(
            np.sort(b + rs.choice(SPAN_WINDOW, B, replace=False)).astype(np.int32)
        )
        for b in rs.randint(0, N - SPAN_WINDOW, size=4)
    ]

    def mk(fn, **kw):
        def step(i, fl):
            ids = lax.switch(i % len(lists), [lambda x=x: x for x in lists])
            return fn(fl, ids, **kw)[0, 0]
        return step

    # correctness probe at 256K spans
    sr, ms, blk = geom(1 << 18)
    got = spans_fetch(flat, lists[0][:4096], span_rows=sr,
                      max_spans=blk, blk=blk, n_inflight=64)
    want = np.asarray(lists[0][:4096], np.int64)[:, None] * np.ones((1, D))
    print("256K-span correct:",
          bool(np.allclose(np.asarray(got), want)), flush=True)

    run("base spans API (32K)", mk(host_gather_rows_spans, dim=D), flat)
    for sb, tag in [(1 << 15, "32K"), (1 << 16, "64K"), (1 << 17, "128K"),
                    (1 << 18, "256K"), (1 << 20, "1M")]:
        sr, ms, blk = geom(sb)
        run(f"spans {tag} inflight128",
            mk(spans_fetch, span_rows=sr, max_spans=ms, blk=blk,
               n_inflight=128), flat)
    sr, ms, blk = geom(1 << 18)
    run("spans 256K inflight256",
        mk(spans_fetch, span_rows=sr, max_spans=ms, blk=blk, n_inflight=256),
        flat)
    # ~every span in the window is touched (1 - e^-25.6), so fetched bytes
    # ~= the whole window
    fetch_bytes = SPAN_WINDOW * D * 4
    for sb, tag in [(1 << 15, "32K"), (1 << 18, "256K")]:
        sr, ms, blk = geom(sb)
        run(f"fetch-only {tag}",
            mk(spans_fetch, span_rows=sr, max_spans=ms, blk=blk,
               n_inflight=128, select=False), flat,
            bytes_moved=fetch_bytes)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

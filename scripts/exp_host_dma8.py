"""Host-tier round 8: the production host_gather_rows fails to compile
('Unimplemented DMA from host to vmem') while exp7's variant D — the same
grid/blocked/HBM structure — works.  Bisect the remaining deltas:

  A. host_gather_rows as-is (D=1024, rpp=1)
  B. host_gather_rows n_inflight=64
  C. raw _host_fetch_chunks (no jit wrapper, no reshape)
  D. exp7-D kernel + masked ring (pl.when on ids)

Run: nohup python scripts/exp_host_dma8.py > /tmp/exp_host8.log 2>&1 &
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import SingleDeviceSharding

from wholegraph_tpu.ops.gather_pallas import (
    _host_fetch_chunks,
    _host_fetch_kernel,
    host_gather_rows,
)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    N, D = 4_000, 1024
    table = np.arange(N, dtype=np.float32)[:, None] * np.ones((1, D), np.float32)
    flat = jax.device_put(jnp.asarray(table.reshape(-1)), hs)
    flat.block_until_ready()
    rs = np.random.RandomState(0)
    slots_np = rs.randint(0, N, 2048).astype(np.int32)
    slots_np[::5] = -1
    slots = jnp.asarray(slots_np)

    for tag, fn in (
        ("A host_gather_rows", lambda: host_gather_rows(flat, slots, dim=D)),
        (
            "B ni=64",
            lambda: host_gather_rows(flat, slots, dim=D, n_inflight=64),
        ),
        (
            "C raw fetch_chunks",
            lambda: _host_fetch_chunks(flat, slots, D, 1024, 128),
        ),
        (
            "D raw ni=64 blk=1024",
            lambda: _host_fetch_chunks(flat, slots, D, 1024, 64),
        ),
    ):
        try:
            out = np.asarray(fn())
            rows = out.reshape(-1, D) if out.ndim == 1 else out
            valid = slots_np >= 0
            ok = np.allclose(rows[: len(slots_np)][valid, 0], slots_np[valid])
            print(f"{tag}: correct={ok}", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL ...{str(e)[-300:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

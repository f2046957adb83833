"""Host-tier round 9: raw _host_fetch_chunks compiles, the jitted
host_gather_rows wrapper hits 'Unimplemented DMA from host to vmem'.
Bisect the wrapper: jit alone, +pad, +reshape/slice consumer.

Run: nohup PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_host_dma9.py > /tmp/exp_host9.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import SingleDeviceSharding

from wholegraph_tpu.ops.gather_pallas import _host_fetch_chunks, _pad_ids


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    hs = SingleDeviceSharding(dev, memory_kind="pinned_host")
    N, D = 4_000, 1024
    flat_np = (
        np.arange(N, dtype=np.float32)[:, None] * np.ones((1, D), np.float32)
    ).reshape(-1)
    flat = jax.device_put(jnp.asarray(flat_np), hs)
    flat.block_until_ready()
    rs = np.random.RandomState(0)
    slots_np = rs.randint(0, N, 2048).astype(np.int32)
    slots_np[::5] = -1
    slots = jnp.asarray(slots_np)
    valid = slots_np >= 0

    def check(tag, fn):
        try:
            out = np.asarray(fn(flat, slots)).reshape(-1, D)
            ok = np.allclose(out[: len(slots_np)][valid, 0], slots_np[valid])
            print(f"{tag}: correct={ok}", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL ...{str(e)[-300:]}", flush=True)

    check("E jit(raw)", jax.jit(lambda f, s: _host_fetch_chunks(f, s, D, 1024, 128)))
    check(
        "F jit(pad+raw)",
        jax.jit(
            lambda f, s: _host_fetch_chunks(
                f, _pad_ids(s.astype(jnp.int32), 1024), D, 1024, 128
            )
        ),
    )
    check(
        "G jit(raw+reshape+slice)",
        jax.jit(
            lambda f, s: _host_fetch_chunks(f, s, D, 1024, 128)
            .reshape(2048, D)[:2048]
            .reshape(-1)
        ),
    )
    check(
        "H jit(astype+raw)",
        jax.jit(
            lambda f, s: _host_fetch_chunks(f, s.astype(jnp.int32), D, 1024, 128)
        ),
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Host-tier round 10: exp9 showed every wrapper piece works when the jit
returns 1-D; host_gather_rows (returns the 2-D reshape of the custom-call
output directly) fails.  Hypothesis: XLA's layout assignment for a program
OUTPUT that is a bitcast-reshape of the host-DMA custom call forces a
host->vmem staging copy.  Variants:

  J. jit: fetch + reshape(Bp, D) returned directly  (expect FAIL)
  K. jit: same + *1.0 elementwise after reshape      (expect ok?)
  L. jit: host_gather_rows result consumed by sum    (expect ok)
  M. rpp=4 path: fetch pages + take_along_axis select, 2-D out

Run: nohup PYTHONPATH=/root/repo:/root/.axon_site python \
  scripts/exp_host_dma10.py > /tmp/exp_host10.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import SingleDeviceSharding

from wholegraph_tpu.ops.gather_pallas import _host_fetch_chunks, host_gather_rows


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

    def check(tag, fn, expect=None):
        try:
            out = np.asarray(fn(flat, slots))
            if expect is None:
                rows = out.reshape(-1, D)
                ok = np.allclose(rows[: len(slots_np)][valid, 0], slots_np[valid])
            else:
                ok = np.isclose(out, expect)
            print(f"{tag}: correct={ok}", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL ...{str(e)[-300:]}", flush=True)

    check(
        "J jit 2-D out",
        jax.jit(lambda f, s: _host_fetch_chunks(f, s, D, 1024, 128).reshape(2048, D)),
    )
    check(
        "K jit 2-D out +mul",
        jax.jit(
            lambda f, s: _host_fetch_chunks(f, s, D, 1024, 128).reshape(2048, D) * 1.0
        ),
    )
    check(
        "L hgr + sum",
        jax.jit(
            lambda f, s: jnp.sum(
                host_gather_rows(f, s, dim=D) * jnp.where(s >= 0, 1.0, 0.0)[:, None],
                axis=None,
            )
        ),
        expect=float((slots_np[valid].astype(np.float64) * D).sum()),
    )

    # M: rpp=4 path (D=256): fetch enclosing pages + in-page select
    D2 = 256
    N2 = 16_000
    flat2_np = (
        np.arange(N2, dtype=np.float32)[:, None] * np.ones((1, D2), np.float32)
    ).reshape(-1)
    flat2 = jax.device_put(jnp.asarray(flat2_np), hs)
    flat2.block_until_ready()
    s2_np = rs.randint(0, N2, 2048).astype(np.int32)
    s2_np[::3] = -1
    s2 = jnp.asarray(s2_np)
    v2 = s2_np >= 0
    try:
        out = np.asarray(host_gather_rows(flat2, s2, dim=D2))
        ok = np.allclose(out[v2, 0], s2_np[v2])
        print(f"M hgr rpp=4: correct={ok}", flush=True)
    except Exception as e:
        print(f"M hgr rpp=4: FAIL ...{str(e)[-300:]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

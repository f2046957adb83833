"""XLA per-edge SDDMM on the clustered bench CSR — the comparison number
for sddmm_window's negative record (r4).

Run detached:
  nohup env PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/exp_sddmm_xla.py > /tmp/exp_sddmm_xla.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

from wholegraph_tpu.ops.spmm import sddmm
from wholegraph_tpu.utils.perf import measure_chain


def main():
    print("device:", jax.devices()[0], flush=True)
    n, deg, dim, width = 1 << 20, 16, 256, 192
    rs = np.random.RandomState(0)
    counts = rs.randint(deg // 2, deg * 2, n)
    rp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    E = int(rp[-1])
    col = (
        np.repeat(np.arange(n), counts)
        + rs.randint(-width // 2, width // 2 + 1, E)
    ).clip(0, n - 1).astype(np.int32)
    dst = np.repeat(np.arange(n), counts).astype(np.int32)
    col_d, dst_d = jnp.asarray(col), jnp.asarray(dst)
    a = jax.jit(lambda: jnp.ones((n, dim), jnp.float32))()

    def step(i, col_d, dst_d, a):
        e = sddmm(col_d, dst_d, a * (1.0 + i * 0.0), a)
        return e[0]

    dts = sorted(measure_chain(step, 6, col_d, dst_d, a) for _ in range(3))
    dt = dts[1]
    print(f"XLA sddmm: {E / dt / 1e6:.1f} Medges/s ({dt*1e3:.1f} ms)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

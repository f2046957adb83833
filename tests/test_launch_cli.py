"""Launcher CLI + true multi-process E2E train-step tests (reference:
distributed_launch.py:190-374 spawn agent; MultiProcessRun composition)."""

import os
import subprocess
import sys

import pytest

from wholegraph_tpu.parallel.multiprocess import multiprocess_run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train_worker(rank, world):
    """2-process x 2-virtual-device sharded embedding train step: the full
    production composition (exact a2a gather + sparse apply) across real
    process boundaries."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import wholegraph_tpu as wg
    from wholegraph_tpu.embedding import Embedding, LazyAdam

    assert jax.process_count() == world
    mesh = wg.parallel.create_global_mesh()
    total = jax.device_count()
    assert total == 4  # 2 procs x 2 virtual devices

    n, dim, B = 64, 8, 32
    emb = Embedding.create(mesh, n, dim, optimizer=LazyAdam())
    state = emb.init(jax.random.PRNGKey(0))

    i = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    target = ((i * 131.0 + j * 7.0 + 1.0) % 997.0 / 997.0).astype(np.float32)

    ids = np.arange(B, dtype=np.int64) % n
    sh_ids = NamedSharding(mesh, P("data"))
    sh_rows = NamedSharding(mesh, P("data", None))
    ids_dev = jax.device_put(jnp.asarray(ids), sh_ids)
    tgt_dev = jax.device_put(jnp.asarray(target[ids]), sh_rows)

    step = emb.make_train_step(lambda rows, t: jnp.mean((rows - t) ** 2), lr=0.05)
    losses = []
    for _ in range(12):
        state, loss = step(state, ids_dev, tgt_dev)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses


@pytest.mark.slow
def test_two_proc_sharded_train_step():
    multiprocess_run(2, _train_worker, devices_per_proc=2, timeout=300)


_CLI_SCRIPT = """
import os
from wholegraph_tpu.parallel.launch import init_distributed
init_distributed()
import jax
import jax.numpy as jnp
from jax.experimental import multihost_utils
assert jax.process_count() == int(os.environ["WORLD_SIZE"]), jax.process_count()
assert jax.device_count() == 4, jax.device_count()
got = multihost_utils.process_allgather(jnp.asarray([jax.process_index()]))
assert sorted(int(x) for x in got.reshape(-1)) == [0, 1]
print("rank", jax.process_index(), "OK")
"""


@pytest.mark.slow
def test_launch_cli_two_procs(tmp_path):
    script = tmp_path / "smoke.py"
    script.write_text(_CLI_SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "wholegraph_tpu.launch",
            "--nproc",
            "2",
            "--backend",
            "cpu",
            "--devices-per-proc",
            "2",
            str(script),
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]


@pytest.mark.slow
def test_launch_cli_propagates_failure(tmp_path):
    script = tmp_path / "boom.py"
    script.write_text("import os, sys; sys.exit(3 if os.environ['RANK'] == '1' else 0)\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "wholegraph_tpu.launch",
            "--nproc",
            "2",
            "--backend",
            "cpu",
            str(script),
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode != 0

"""Multi-process test/launch harness.

Analog of the reference's MultiProcessRun (reference:
cpp/src/parallel_utils.cpp:46-90 — fork one child per GPU, pipe-based
bootstrap, exit-code aggregation — and python utils/multiprocess.py:29-38).
On TPU the common substitute is a virtual-device mesh in one process (see
tests/conftest.py), but true multi-HOST behavior (jax.distributed, DCN
collectives) needs real processes; this harness forks them and wires the
jax.distributed coordinator, each child running on the CPU backend with its
own virtual devices.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from typing import Callable, Optional

from ..utils import logger
from ..utils.error import check


def _child(rank: int, world: int, port: int, devices_per_proc: int, log_path, fn, args):
    import sys
    import traceback

    log = open(log_path, "w")
    try:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices_per_proc}"
        )
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=world,
            process_id=rank,
        )
        try:
            fn(rank, world, *args)
        finally:
            jax.distributed.shutdown()
    except BaseException:
        traceback.print_exc(file=log)
        log.flush()
        sys.exit(1)
    finally:
        log.close()


def multiprocess_run(
    world: int,
    fn: Callable,
    args: tuple = (),
    *,
    devices_per_proc: int = 1,
    port: Optional[int] = None,
    timeout: float = 300.0,
) -> None:
    """Fork ``world`` processes, each a jax.distributed participant, run
    ``fn(rank, world, *args)`` in every one, and check all exit codes
    (MultiProcessRun semantics incl. the exit-code aggregation)."""
    if port is None:
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    import tempfile

    logdir = tempfile.mkdtemp(prefix="wgtpu_mp_")
    logs = [os.path.join(logdir, f"rank{r}.log") for r in range(world)]
    ctx = mp.get_context("spawn")  # fresh interpreters: no inherited backends
    procs = [
        ctx.Process(
            target=_child, args=(r, world, port, devices_per_proc, logs[r], fn, args)
        )
        for r in range(world)
    ]
    for p in procs:
        p.start()
    for r, p in enumerate(procs):
        p.join(timeout)
        if p.is_alive():
            for q in procs:
                q.terminate()
            check(False, f"rank {r} timed out after {timeout}s")
    bad = [(r, p.exitcode) for r, p in enumerate(procs) if p.exitcode != 0]
    if bad:
        details = []
        for r, code in bad:
            try:
                with open(logs[r]) as f:
                    details.append(f"rank {r} (exit {code}):\n{f.read()[-2000:]}")
            except OSError:
                details.append(f"rank {r} (exit {code}): <no log>")
        check(False, "child failures:\n" + "\n".join(details))
    logger.debug("multiprocess_run(%d) completed", world)

"""Launcher CLI: spawn N training processes with distributed bootstrap.

TPU-native analog of the reference's launch agents (reference: python
torch/distributed_launch.py:190-374 — mpi / torchrun / spawn agents that
fork a training script per rank and wire rank/world env vars :169-188).
Usage::

    python -m wholegraph_tpu.launch --nproc 2 examples/node_classification.py -- --epochs 1

Each child runs the script with ``RANK`` / ``WORLD_SIZE`` /
``MASTER_ADDR`` / ``MASTER_PORT`` / ``LOCAL_RANK`` set; the script calls
:func:`wholegraph_tpu.parallel.launch.init` (or ``init_distributed``) which
reads exactly these variables — the same contract as the reference's
``get_*`` env helpers.  ``--backend cpu`` forces the XLA host platform with
``--devices-per-proc`` virtual devices per process (the multi-host CI
emulation; on a real pod leave the default backend and let each process own
its local chips).
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
from typing import List


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m wholegraph_tpu.launch",
        description="Spawn-mode distributed launcher (distributed_launch.py analog)",
    )
    ap.add_argument("--nproc", type=int, default=1, help="processes to spawn on this host")
    ap.add_argument("--node-rank", type=int, default=0, help="index of this host")
    ap.add_argument("--nnodes", type=int, default=1, help="total hosts")
    ap.add_argument("--master-addr", default="127.0.0.1")
    ap.add_argument("--master-port", type=int, default=0, help="0 = pick a free port")
    ap.add_argument(
        "--backend",
        choices=["default", "cpu"],
        default="default",
        help="cpu = XLA host platform with --devices-per-proc virtual devices",
    )
    ap.add_argument("--devices-per-proc", type=int, default=1)
    ap.add_argument("script", help="training script to run per rank")
    ap.add_argument("script_args", nargs=argparse.REMAINDER, help="args after the script")
    return ap


def launch(argv: List[str]) -> int:
    args = build_parser().parse_args(argv)
    port = args.master_port or _free_port()
    world = args.nproc * args.nnodes
    script_args = args.script_args
    if script_args and script_args[0] == "--":
        script_args = script_args[1:]

    procs = []
    for local_rank in range(args.nproc):
        rank = args.node_rank * args.nproc + local_rank
        env = dict(os.environ)
        env.update(
            RANK=str(rank),
            WORLD_SIZE=str(world),
            LOCAL_RANK=str(local_rank),
            LOCAL_WORLD_SIZE=str(args.nproc),
            MASTER_ADDR=args.master_addr,
            MASTER_PORT=str(port),
        )
        if args.backend == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices_per_proc}"
            )
            env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, args.script, *script_args],
                env=env,
            )
        )

    def _forward(signum, frame):
        for p in procs:
            if p.poll() is None:
                p.send_signal(signum)

    signal.signal(signal.SIGINT, _forward)
    signal.signal(signal.SIGTERM, _forward)

    rc = 0
    for rank, p in enumerate(procs):
        code = p.wait()
        if code != 0:
            print(f"[launch] rank {rank} exited with {code}", file=sys.stderr)
            rc = rc or code
            # one failure kills the job (MultiProcessRun exit-code aggregation)
            for q in procs:
                if q.poll() is None:
                    q.terminate()
    return rc


def main() -> None:
    sys.exit(launch(sys.argv[1:]))


if __name__ == "__main__":
    main()

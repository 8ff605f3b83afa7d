"""Multi-slice (DCN) dry run: the (dp, shard) program spans processes.

Spawns N real OS processes, each with its own virtual CPU devices, joined
through jax.distributed into one global mesh — the CPU simulation of
multi-slice TPU over DCN. Every process executes the same sharded top-k
program and verifies its addressable output shards against a numpy oracle.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def test_multislice_dryrun_two_processes():
    coordinator = f"127.0.0.1:{_free_port()}"
    num_processes = 2
    procs = []
    for pid in range(num_processes):
        env = os.environ.copy()
        env.pop("XLA_FLAGS", None)  # each process sets its own device count
        env.pop("TAT_TEST_TPU", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "typeagent_tpu.parallel.multislice",
                    coordinator,
                    str(num_processes),
                    str(pid),
                    "4",
                ],
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=240)
        outputs.append(out)
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"process {pid} failed:\n{out}"
        assert "multislice dryrun OK" in out, out

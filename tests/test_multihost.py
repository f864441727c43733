"""Multi-PROCESS mesh equivalence: the real multi-host code path.

Unlike tests/test_parallel.py (one process, 8 virtual devices), this
spawns TWO separate processes that join a jax.distributed cluster
(Gloo-backed CPU collectives) and form a (2, 2) process-spanning mesh —
the same topology as hosts in a TPU pod, with the y halo crossing the
process (DCN) boundary through the cylinder's reconstruction band.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_unsharded():
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(here)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"proc {i} OK" in out, f"worker {i} output:\n{out}"

"""Multi-host distributed execution: 2 jax processes x 4 virtual CPU
devices = one global 8-device mesh stitched over Gloo (the DCN
stand-in).  Validates that the distributed SQL executor is genuinely
SPMD — collectives cross the process boundary, host syncs read only
locally addressable shards, and gathers all-gather across processes —
by asserting TPC-H row parity inside each worker (tests/mh_worker.py).

BASELINE.md target being exercised: "1 chip -> 1 host -> N>=2 hosts"
(functional leg; perf scaling is measured by benchmark/scaling on real
hardware).
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_tpch_parity():
    port = _free_port()
    env = dict(os.environ)
    # workers configure their own platform/device env
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests", "mh_worker.py"),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=_REPO, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.strip().splitlines()[-15:])
        assert p.returncode == 0, f"worker {i} failed:\n{tail}"
        assert "PARITY OK" in out, f"worker {i} no parity marker:\n{tail}"

"""REAL multi-process distributed test — no fake process groups, matching
the reference's stance ("no mocks anywhere", SURVEY.md §4: multi-GPU via
torchrun). Two OS processes each own 4 virtual CPU devices, rendezvous
through jax.distributed's coordinator, and run cross-process data-parallel
attention + a GSPMD-reduced gradient (tests/multihost_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("MULTIHOST_OK" in o for o in outs)
    assert any("ENGINE_DP_OK" in o for o in outs), outs[0][-2000:]
    assert any("ENGINE_SPMD_OK" in o for o in outs), outs[0][-2000:]

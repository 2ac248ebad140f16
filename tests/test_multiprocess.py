"""Multi-host scaffolding: launch N real processes (2 virtual CPU devices
each), initialize the jax process group over gloo, and run FULL simulations
over the process-spanning pod mesh (tests/mp_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: excluded from test-fast

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc", [2])
def test_multiprocess_simulation(nproc):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multiprocess workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "ALL MULTIPROCESS CHECKS PASS" in out, f"worker {i}:\n{out}"

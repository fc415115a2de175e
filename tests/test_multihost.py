"""2-process multi-host regression: jax.distributed over CPU+Gloo.

Two engine processes x 4 virtual CPU devices = one 8-device global mesh;
the distributed executor must produce oracle-exact results with its
collectives crossing the process boundary (SURVEY.md §5: the reference
has no multi-process anything; this is the pod-scale scaffolding).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_oracle():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # worker sets its own device count (4)
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    assert all(rc == 0 for rc, _, _ in outs), outs
    assert "MULTIHOST_OK" in outs[0][1], outs

"""Two-process ``jax.distributed`` smoke test for ``multihost_init``.

The framework's multi-host story (SURVEY.md §2.3/§5: DCN via
``jax.distributed.initialize``, ICI collectives within a slice) cannot
be exercised on single-host CI by the in-process 8-device mesh — that
mesh is one process. This test spawns two REAL processes with 2 virtual
CPU devices each, initializes the distributed runtime, and reduces a
globally sharded array across them (tests/_multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init():
    port = _free_port()
    env = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    # the workers pin their own JAX_PLATFORMS/XLA_FLAGS; drop this
    # process's virtual-device settings so they don't leak through
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=150)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-2000:]}"
    assert any("OK 0" in out for _, out, _ in outs)
    assert any("OK 1" in out for _, out, _ in outs)

"""Multi-host (multi-process) mesh demo: 2 jax.distributed processes x 4
virtual CPU devices = one 8-device global mesh; time-blocks live on
different *processes* and the acquisition integration psums across the
host boundary (BASELINE.json config 5 structure, DCN stand-in)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    # stage 4 (RUN_SLOW) tracks a full 29 s capture per process
    budget = 1200 if os.environ.get("RUN_SLOW") == "1" else 240
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=budget)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for rc, out, err in outs:
        assert rc == 0, (rc, err[-2000:])
    assert any("MULTIHOST_OK" in out for _, out, _ in outs), outs[0][1]

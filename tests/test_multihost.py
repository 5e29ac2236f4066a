"""True multi-process 'multi-host' coverage on CPU (SURVEY.md §4): two
OS processes, 4 CPU devices each, one 8-device global mesh via
`jax.distributed` — the packed-payload collectives must produce the exact
single-process result across the process boundary.

This is a capability tier above the in-process 8-virtual-device mesh used
by the rest of the suite (which exercises GSPMD but not cross-process
collectives); the reference's only distributed coverage is a 1-process
torchrun FSDP save test (tests/fsdp_state_dict_save.py)."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_packed_collectives():
    root = pathlib.Path(__file__).resolve().parents[1]
    worker = root / "tests" / "multihost_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=root,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST-OK" in out, out[-3000:]

"""REAL multi-process distributed test (SURVEY.md §5.8).

Spawns two coordinated JAX processes (2 CPU devices each → a 4-device
global mesh, gloo collectives standing in for DCN) and runs the
sharded shared grBCM fit + psum-aggregated predict across the process
boundary, checking it against the single-host vmapped committee.  This
exercises ``multihost_init`` / ``jax.distributed.initialize`` for
real — the path a pod deployment takes — which virtual-device meshes
cannot cover.
"""

import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_grbcm_matches_single_host():
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=570)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"[{i}] MP-OK" in out

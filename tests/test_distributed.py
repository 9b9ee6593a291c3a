"""Multi-process ``jax.distributed`` smoke test (SURVEY.md §2 comm-backend
row; the reference is single-process by construction).

Spawns 2 real OS processes, each with 4 virtual CPU devices, that join one
JAX cluster over a localhost coordinator and run a mesh-sharded batched
solve end-to-end (tests/distributed_worker.py), exercising
``distributed.initialize``, ``global_batch_mesh``, ``global_solver_mesh``,
``host_local_slice``, and cross-process result gathering.
"""

import os
import socket
import subprocess
import sys

import pytest

NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(worker_name: str, ok_marker: str, timeout: int = 420):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", worker_name)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo         # script-mode runs don't add the cwd
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(NPROC)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=repo, env=env)
        for i in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {i} failed (rc={p.returncode}):\n{out}"
        assert f"[worker {i}] {ok_marker}" in out, out


@pytest.mark.slow
def test_two_process_distributed_batch_solve():
    _run_workers("distributed_worker.py", "OK")


@pytest.mark.slow
def test_two_process_schur_block_solve():
    """The general Schur/TP solver executed ACROSS A REAL PROCESS
    BOUNDARY: the ``model`` mesh axis spans 2 OS processes, theta/x0 are
    block-sharded via make_array_from_process_local_data, and the solve,
    the assembled single-device parity oracle, and an npz
    checkpoint-pause-resume cycle all run through it
    (tests/schur_worker.py)."""
    _run_workers("schur_worker.py", "SCHUR OK", timeout=600)

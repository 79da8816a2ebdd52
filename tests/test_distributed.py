"""Multi-host execution via jax.distributed (SURVEY.md §5 "multi-host via
jax.distributed"; thesis ch.5 multi-GPU sketch scaled past one process).

Launches TWO OS processes, each running the real CLI with --distributed
(jax.distributed.initialize over a localhost coordinator, Gloo CPU
backend), a 2-device global mesh (one CPU device per process), and the
x-plane-sharded solve: the finest level is split across the processes and
the ppermute halo exchanges run over the cross-process backend.  Process 0
prints the result JSON; process 1 must stay silent (output gating,
__main__.py)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(port, pid, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    # one CPU device per process: the 2-device mesh spans the processes
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return subprocess.Popen(
        [
            sys.executable,
            "-m",
            "pde_multigrid_tpu",
            "--problem",
            "poisson3d",
            "--n",
            "33",
            "--kind",
            "fmg",
            "--nu0",
            "1",
            "--nu1",
            "2",
            "--nu2",
            "2",
            "--cycles",
            "2",
            "--distributed",
            f"localhost:{port}",
            "--num-processes",
            "2",
            "--process-id",
            str(pid),
            "--mesh",
            "2",
            *extra,
        ],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def test_two_process_distributed_solve():
    port = _free_port()
    procs = [_launch(port, 0), _launch(port, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"process failed:\n{out}\n{err}"
    # process 0 prints the result JSON; find it among Gloo chatter
    json_lines = [
        l for l in outs[0][1].splitlines() if l.startswith("{")
    ]
    assert len(json_lines) == 1, outs[0][1]
    res = json.loads(json_lines[0])
    assert res["problem"] == "poisson3d"
    assert not res["diverged"]
    # converged to discretization accuracy: O(h^2) at n=33
    assert res["error_linf"] < 50 * (1.0 / 32) ** 2
    assert res["residual_history"][-1] < 0.2 * res["residual_history"][0]
    # process 1 prints NO result (process-0 output gating)
    assert not any(l.startswith("{") for l in outs[1][1].splitlines())

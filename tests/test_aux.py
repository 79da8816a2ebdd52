"""Auxiliary subsystems (SURVEY.md §5): checkpoint/resume, divergence
guard, metrics JSONL, grid dumps, CLI driver."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.utils import MetricsLogger
from pde_multigrid_tpu.utils.checkpointing import (
    load_levels,
    load_meta,
    save_levels,
)
from pde_multigrid_tpu.utils.gridlog import diff_stats, dump_grid_v


def mk_solver(n=33, cycles=2):
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2), max_cycles=cycles, tol=0.0
    )
    return MultigridSolver(Poisson(2), n, cfg)


def test_checkpoint_roundtrip(tmp_path):
    s = mk_solver()
    levels = s.fresh_levels()
    levels = s._step.lower(levels).compile()(levels)
    path = str(tmp_path / "ckpt.npz")
    save_levels(path, levels, meta={"cycle": 1})
    assert load_meta(path)["cycle"] == 1
    restored, meta = load_levels(path, s)
    np.testing.assert_array_equal(
        np.asarray(levels[0].v), np.asarray(restored[0].v)
    )
    # resume: continuing from the checkpoint matches continuing in-memory
    r_resumed = s.solve_to_tolerance(levels=restored)
    assert r_resumed.residual_l2 < 1e-2


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    s33 = mk_solver(33)
    path = str(tmp_path / "c.npz")
    save_levels(path, s33.fresh_levels())
    s17 = mk_solver(17)
    with pytest.raises(ValueError):
        load_levels(path, s17)


def test_divergence_guard():
    """An unstable schedule (huge over-relaxation) must trip the guard
    instead of looping to max_cycles."""
    cfg = SolverConfig(
        cycle=CycleConfig("v", 0, 2, 2, smoother="jacobi", omega=2.5),
        max_cycles=50,
        tol=0.0,
        divergence_factor=10.0,
    )
    r = MultigridSolver(Poisson(2), 33, cfg).solve_to_tolerance()
    assert r.diverged
    assert r.cycles_run < 50


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    s = mk_solver(cycles=3)
    with MetricsLogger(path) as m:
        s.solve_to_tolerance(metrics=m)
    recs = [json.loads(l) for l in open(path)]
    cyc = [r for r in recs if r["event"] == "cycle"]
    assert len(cyc) == 3
    assert cyc[1]["rho"] is not None and cyc[1]["rho"] < 1.0


def test_grid_dump_and_diff_stats(tmp_path):
    s = mk_solver()
    r = s.solve_to_tolerance()
    import dataclasses

    lv0 = dataclasses.replace(s.fresh_levels()[0], v=r.v)
    stats = diff_stats(lv0, s.geoms[0], s.problem)
    assert stats["mae"] < 1e-3
    assert stats["n_interior"] == 31 * 31
    path = str(tmp_path / "log_v.txt")
    n = dump_grid_v(path, lv0, s.geoms[0], s.problem, max_points=50)
    lines = open(path).read().splitlines()
    assert len(lines) == n == 50
    assert "approxSol" in lines[0] and "realSol" in lines[0]


def test_cli_driver_smoke():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # skip the TPU-relay plugin registration entirely: its connection
    # attempt can hang the subprocess at interpreter startup
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "pde_multigrid_tpu",
            "--problem",
            "poisson2d",
            "--n",
            "33",
            "--kind",
            "fmg",
            "--nu1",
            "2",
            "--nu2",
            "2",
            "--backend",
            "jnp",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=560,  # interpreter startup alone costs ~60s in this env
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["problem"] == "poisson2d"
    assert rec["error_linf"] < 1e-3
    assert "Finished in about" in out.stderr


def test_solve_is_deterministic():
    """SURVEY.md §5 (race detection row): masked functional updates are
    race-free by construction, and reductions are deterministic — two
    identical solves must agree BITWISE, including the residual norms."""
    import numpy as np

    from pde_multigrid_tpu import (
        CycleConfig,
        Lyapunov2D,
        MultigridSolver,
        SolverConfig,
    )

    cfg = SolverConfig(cycle=CycleConfig("fmg", 1, 3, 3), max_cycles=2)
    outs = []
    for _ in range(2):
        r = MultigridSolver(Lyapunov2D(), 65, cfg).solve_to_tolerance()
        outs.append((np.asarray(r.v), r.residual_l2, r.error_linf))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    assert outs[0][2] == outs[1][2]

"""Roofline/update-count model sanity (utils/roofline.py, bench.py).

The models feed the reported %-of-roofline and DOF-updates/s headline
numbers (BASELINE.md), so they get their own guards: the update count
must match what the cycle driver actually executes, and the traffic
model must mirror the kernel planner's tier choices.
"""

import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    Poisson3D,
    SolverConfig,
)
from pde_multigrid_tpu.utils import roofline


def _count_via_bench(shapes, kind, nu0, nu1, nu2, mu=1, coarsest="relax"):
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench.count_smoother_updates(
        shapes, kind, nu0, nu1, nu2, mu, coarsest=coarsest
    )


def test_update_count_matches_instrumented_cycle():
    """bench.count_smoother_updates == sweeps actually issued by
    CycleProgram (counted via an instrumented kernel tier)."""
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, 3, 4, coarsest="relax"),
        backend="jnp",
    )
    solver = MultigridSolver(Poisson3D(), 17, cfg)
    prog = solver.program
    counted = []
    real_relax = prog.kernels.relax

    def counting_relax(l, v, f, aux, nsweeps, f_zero=False):
        counted.append((l, nsweeps))
        return real_relax(l, v, f, aux, nsweeps, f_zero=f_zero)

    prog.kernels.relax = counting_relax
    prog.solve_step(solver.fresh_levels())
    prog.kernels.relax = real_relax

    shapes = [g.shape for g in solver.geoms]
    interior = [
        int(jnp.prod(jnp.asarray([max(n - 2, 1) for n in s])))
        for s in shapes
    ]
    issued = sum(interior[l] * ns for l, ns in counted)
    want = _count_via_bench(shapes, "fmg", 2, 3, 4)
    assert issued == want


def test_update_count_exact_coarsest_excludes_coarse_sweeps():
    shapes = [(17, 17, 17), (9, 9, 9), (5, 5, 5)]
    full = _count_via_bench(shapes, "fmg", 2, 3, 3)
    trunc = _count_via_bench(shapes, "fmg", 2, 3, 3, coarsest="exact")
    assert trunc < full
    # the difference is exactly the coarsest level's sweeps
    coarse_int = 3 * 3 * 3
    coarse_legs = sum(2 for _root in range(3))  # nu0=2 -> 2 v-cycles/root
    # every v_cycle reaches the coarsest once: roots x nu0 v-cycles
    n_vcycles = 3 * 2
    assert full - trunc == n_vcycles * (3 + 3) * coarse_int


def test_traffic_model_mirrors_planner_tiers():
    """Per-level traffic rows reflect the kernels the planner picks:
    resident levels amortize per leg, 129^3-class mixed legs take the
    resident-defect figure, larger wrap levels the time-skew figure."""
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, 100, 100, coarsest="exact"),
        backend="jnp",
        precision="mixed",
    )
    s = MultigridSolver(Poisson3D(), 129, cfg)
    rows, total, _ = roofline.cycle_traffic_model(
        s.geoms, "fmg", 2, 100, 100, 1, precision="mixed"
    )
    # finest level: resident-defect leg = nu-free 24 B/point/leg
    l0 = rows[0]
    assert l0.resident  # flagged resident by the defect branch
    per_leg = l0.bytes_per_sweep * 100
    stored = l0.stored_points
    assert abs(per_leg - 24 * stored) / (24 * stored) < 0.01
    # coarse 64^3 level is genuinely VMEM-resident
    assert rows[1].resident


def test_traffic_model_f32_large_level_uses_timeskew_figure():
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, 16, 16, coarsest="exact"),
        backend="jnp",
    )
    s = MultigridSolver(Poisson3D(), 257, cfg)
    t = roofline.relax_traffic(s.geoms[0], 16)
    # 10 B/point per 8-sweep chunk, 2 chunks over 16 sweeps
    # -> 1.25 B/point/sweep
    stored = t.stored_points
    assert abs(t.bytes_per_sweep - 1.25 * stored) < 0.01 * stored
    assert t.bytes_per_sweep < 4 * stored  # far below the slab figure


def test_traffic_model_mirrors_timeskew_engagement_gates():
    """plan_relax only engages time-skew when the half-plane has >=16384
    points; a 129^3 f32 wrap level (8192-point half-planes) runs the
    trapezoid slab, so its traffic figure must be the slab one (~14-24
    B/point/sweep), not the time-skew ~1.25 B/point/sweep.  Problems
    without split_update (HJB/varcoef) never get color-split figures."""
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, 16, 16, coarsest="exact"),
        backend="jnp",
    )
    s129 = MultigridSolver(Poisson3D(), 129, cfg)
    t = roofline.relax_traffic(s129.geoms[0], 16)
    stored = t.stored_points
    assert t.bytes_per_sweep > 10 * stored  # slab figure, not time-skew

    # a 257^3-class level DOES time-skew — but not without split_caps
    s257 = MultigridSolver(Poisson3D(), 257, cfg)
    t_split = roofline.relax_traffic(s257.geoms[0], 16)
    t_nosplit = roofline.relax_traffic(
        s257.geoms[0], 16, split_caps=False
    )
    assert t_split.bytes_per_sweep < 2 * t_split.stored_points
    assert t_nosplit.bytes_per_sweep > 10 * t_nosplit.stored_points

    # 2D: without split_update2d the dense-slab figure applies (~4x the
    # split figure at SPLIT2D_T=16)
    from pde_multigrid_tpu import Lyapunov2D

    cfg2 = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2),
        backend="jnp",
        # TPU-style tile padding (the split-2D kernel's real geometry)
        pad_sublane_to=8,
        pad_last_to=128,
    )
    s2d = MultigridSolver(Lyapunov2D(), 1025, cfg2)
    g = s2d.geoms[0]
    t2_split = roofline.relax_traffic(g, 16)
    t2_dense = roofline.relax_traffic(g, 16, split_caps=False)
    assert not t2_split.resident
    assert t2_dense.bytes_per_sweep > 3 * t2_split.bytes_per_sweep


def test_vpu_bound_is_finite_and_dimension_aware():
    b3 = roofline.vpu_bound_updates_per_s(3)
    b2 = roofline.vpu_bound_updates_per_s(2)
    assert 0 < b3 < b2  # fewer ops per update in 2D

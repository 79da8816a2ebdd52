"""End-to-end convergence tests (SURVEY.md §4 implications (a), (b)):
per-V-cycle residual reduction factors, and solution accuracy vs the
analytic oracles at the reference's tolerance envelope."""

import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    Ode1D,
    Poisson,
    SolverConfig,
)


def solve(problem, n, kind, nu0, nu1, nu2, mu=1, dtype="float32", cycles=1, tol=0.0):
    cfg = SolverConfig(
        cycle=CycleConfig(kind, nu0, nu1, nu2, mu),
        dtype=dtype,
        max_cycles=cycles,
        tol=tol,
    )
    return MultigridSolver(problem, n, cfg).solve_to_tolerance()


# ------------------------------------------------- residual reduction factors


def test_vcycle_reduction_poisson2d():
    r = solve(Poisson(2), 65, "v", 0, 2, 2, cycles=3)
    h = r.residual_history
    assert h[1] / h[0] < 0.15  # typical RBGS V(2,2) rho ~ 0.06
    assert h[2] / h[1] < 0.25


def test_vcycle_reduction_poisson3d():
    r = solve(Poisson(3), 33, "v", 0, 2, 2, cycles=3)
    h = r.residual_history
    assert h[1] / h[0] < 0.25
    assert h[2] / h[1] < 0.30


def test_vcycle_reduction_lyapunov2d():
    r = solve(Lyapunov2D(), 65, "v", 0, 8, 8, cycles=3)
    h = r.residual_history
    assert h[1] / h[0] < 0.1


def test_wcycle_converges_poisson2d():
    r = solve(Poisson(2), 65, "w", 0, 2, 2, mu=2, cycles=2)
    h = r.residual_history
    # W(2,2) first cycle already near the float32 residual floor
    assert h[0] < 5e-2
    assert r.error_linf < 4e-4


def test_float64_deep_convergence_poisson2d():
    """BASELINE.json config-1-style tolerance: residual to 1e-10 in f64."""
    r = solve(
        Poisson(2), 65, "v", 0, 2, 2, dtype="float64", cycles=14, tol=1e-10
    )
    assert r.residual_l2 <= 1e-10
    assert r.cycles_run <= 12


# ----------------------------------------------------- accuracy vs the oracle


def test_fmg_accuracy_poisson1d():
    r = solve(Poisson(1), 65, "fmg", 1, 2, 2)
    assert r.error_linf < 4e-4  # ~ C h^2, h = 1/64


def test_fmg_accuracy_poisson2d():
    r = solve(Poisson(2), 65, "fmg", 1, 2, 2)
    assert r.error_linf < 4e-4


def test_fmg_accuracy_poisson3d():
    """The thesis parity case at test scale (Poisson3DSolver.cpp config,
    smaller N and sane nu)."""
    r = solve(Poisson(3), 33, "fmg", 2, 2, 2)
    assert r.error_linf < 1.5e-3
    assert r.residual_l2 < 1e-2


def test_fmg_second_order_convergence_poisson2d():
    """Error must shrink ~4x per mesh refinement (O(h^2) discretization)."""
    e17 = solve(Poisson(2), 17, "fmg", 1, 2, 2).error_linf
    e33 = solve(Poisson(2), 33, "fmg", 1, 2, 2).error_linf
    ratio = e17 / e33
    assert 3.0 < ratio < 7.0


def test_fmg_accuracy_ode1d():
    """1D first-order ODE (forward differences -> O(h) accuracy)."""
    r = solve(Ode1D(), 257, "fmg", 2, 8, 8)
    assert r.error_l2 < 5e-3  # h = 1/256 -> O(h) ~ 4e-3
    assert r.residual_l2 < 2e-3


def test_fmg_accuracy_ode1d_reference_config_f64():
    """Reference driver scale (Poisson1DSolver.cpp: N=8193 -> here 1025 for
    test speed), float64."""
    r = solve(Ode1D(), 1025, "fmg", 2, 8, 8, dtype="float64")
    assert r.error_l2 < 1.5e-3  # O(h), h ~ 1e-3


def test_fmg_restart_nonzero_dirichlet():
    """solve_step (FMG) must be a complete solve from ANY incoming state,
    not just fresh levels: earlier cycles zero coarse-level boundaries
    (coarse v holds the error there), and FMG's upward leg must re-impose
    the Dirichlet data before treating v as the solution.  Regression:
    rerunning FMG on a solved state used to diverge on nonzero-boundary
    problems (err 1e-4 -> 9e-2 on ode1d)."""
    for problem, n in ((Ode1D(), 513), (Lyapunov2D(), 65)):
        cfg = SolverConfig(cycle=CycleConfig("fmg", 2, 8, 8))
        s = MultigridSolver(problem, n, cfg)
        lv = s.fresh_levels()
        errs = []
        for _ in range(3):
            lv = s.program.solve_step(lv)
            fin = lv[0]
            geo = s.geoms[0]
            exact = problem.exact_solution(geo.coords(fin.v.dtype))
            diff = np.asarray((fin.v - exact) * fin.aux["m_int"])
            errs.append(np.abs(diff).max())
        assert errs[1] < 2 * errs[0] + 1e-7, errs
        assert errs[2] < 2 * errs[0] + 1e-7, errs


def test_fmg_accuracy_lyapunov2d():
    """MAE vs the quadratic Lyapunov form (the thesis Fig. 4.3 metric)."""
    r = solve(Lyapunov2D(), 65, "fmg", 1, 8, 8, cycles=2)
    assert r.error_mae < 2e-2  # O(h) one-sided differences, h = 1/64
    assert r.residual_l2 < 5e-4


def test_lyapunov2d_reference_cuda_domain():
    """The CUDA driver's config: domain [0,20]^2, N=65 (main.cu:13-25).
    Larger domain -> larger h -> larger absolute MAE (thesis Fig. 4.3
    plots values up to ~6)."""
    prob = Lyapunov2D(domain=((0.0, 20.0), (0.0, 20.0)))
    r = solve(prob, 65, "fmg", 2, 60, 60)
    # exact V on [0,20]^2 reaches 2*400 = 800; MAE within the thesis chart
    # envelope (0-6) at this resolution
    assert r.error_mae < 6.0
    assert r.residual_l2 < 5e-2 * 800


def test_vcycle_monotone_nontrivial_history():
    r = solve(Poisson(2), 33, "v", 0, 2, 2, cycles=5)
    h = np.array(r.residual_history)
    assert (h[1:3] < h[:2]).all()


# ------------------------------------------- f_zero static-RHS leg threading


def test_f_zero_threading():
    """CycleProgram passes f_zero=True exactly on the RHS-carrying relax
    legs (root level of each V-cycle invoked on cascaded RHS) of
    rhs_is_zero problems, and never on restricted-residual legs."""
    from pde_multigrid_tpu.cycles import CycleProgram, JnpKernels
    from pde_multigrid_tpu.grid import Hierarchy

    prob = Lyapunov2D()
    assert prob.rhs_is_zero
    h = Hierarchy.build(prob, 17)

    calls = []

    class Recording(JnpKernels):
        def relax(self, l, v, f, aux, nsweeps, f_zero=False):
            calls.append((l, f_zero))
            return super().relax(l, v, f, aux, nsweeps)

    prog = CycleProgram(
        prob, h.geoms, CycleConfig("fmg", 1, 1, 1),
        kernels=Recording(prob, h.geoms),
    )
    prog.solve_step(tuple(h.levels))
    # FMG upward leg: each level is visited as a V-cycle ROOT (cascaded
    # zero RHS -> f_zero=True there) and as an interior level of finer
    # roots' cycles (restricted residual -> False)
    roots = {l for (l, fz) in calls if fz}
    nonroots = {l for (l, fz) in calls if not fz}
    nlev = len(h.geoms)
    # every level is an FMG root once (coarsest='relax' relaxes it too)
    assert roots == set(range(nlev))
    assert nonroots == set(range(1, nlev))

    calls.clear()
    prog2 = CycleProgram(
        prob, h.geoms, CycleConfig("v", 0, 1, 1),
        kernels=Recording(prob, h.geoms),
    )
    prog2.solve_step(tuple(h.levels))
    assert [(l, fz) for (l, fz) in calls if fz] == [(0, True), (0, True)]

    # non-zero-RHS problem: never f_zero
    calls.clear()
    p3 = Poisson(3)
    h3 = Hierarchy.build(p3, 17)
    prog3 = CycleProgram(
        p3, h3.geoms, CycleConfig("fmg", 1, 1, 1),
        kernels=Recording(p3, h3.geoms),
    )
    prog3.solve_step(tuple(h3.levels))
    assert not any(fz for (_, fz) in calls)


def test_baseline_config1_ode1d_vcycle_jacobi_to_1e8():
    """BASELINE.json config 1 verbatim: 1D two-point BVP, N=1025,
    V-cycle with (damped, omega=2/3) Jacobi smoothing, iterated to a
    1e-8 residual."""
    cfg = SolverConfig(
        cycle=CycleConfig(
            "v", 0, 4, 4, smoother="jacobi", omega=2.0 / 3.0
        ),
        dtype="float64",
        max_cycles=30,
        tol=1e-8,
    )
    r = MultigridSolver(Ode1D(), 1025, cfg).solve_to_tolerance()
    assert r.residual_l2 <= 1e-8
    assert r.cycles_run < 30

"""Smoother options beyond the reference's RBGS: damped Jacobi, zebra line
relaxation (anisotropy-robust), and the exact associative-scan 1D solve
(BASELINE.json configs 1 and 5)."""

import numpy as np
import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Ode1D,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.ops import stencil


def solve(problem, n, cycle, dtype="float32", cycles=1, tol=0.0, **cyc_kw):
    cfg = SolverConfig(
        cycle=CycleConfig(**cycle, **cyc_kw),
        dtype=dtype,
        max_cycles=cycles,
        tol=tol,
    )
    return MultigridSolver(problem, n, cfg).solve_to_tolerance()


def test_thomas_solver_exact():
    """Batched Thomas vs dense solve on a random diagonally-dominant
    tridiagonal system with identity (boundary) rows."""
    rng = np.random.default_rng(3)
    n, batch = 16, 5
    a = np.zeros(n)
    b = np.ones(n)
    c = np.zeros(n)
    a[1:-1] = rng.uniform(0.5, 1.0, n - 2)
    c[1:-1] = rng.uniform(0.5, 1.0, n - 2)
    b[1:-1] = -(a[1:-1] + c[1:-1]) - rng.uniform(1.0, 2.0, n - 2)
    d = rng.standard_normal((n, batch))
    got = np.asarray(
        stencil.thomas_tridiagonal(
            jnp.asarray(a, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(d, jnp.float32),
            axis=0,
        )
    )
    m = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    want = np.linalg.solve(m, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_jacobi_vcycle_converges_poisson2d():
    r = solve(
        Poisson(2),
        65,
        dict(kind="v", nu0=0, nu1=3, nu2=3, smoother="jacobi", omega=2 / 3),
        cycles=4,
    )
    h = r.residual_history
    assert h[1] / h[0] < 0.3
    assert h[-1] < 1e-2 * h[0]


def test_line_relaxation_beats_point_on_anisotropic_3d():
    """Strong z-coupling (domain squashed in z): point-RBGS V-cycles
    degrade, z-line zebra relaxation keeps textbook convergence
    (BASELINE.json config 5)."""
    aniso = Poisson(3, domain=((0.0, 1.0), (0.0, 1.0), (0.0, 0.05)))
    r_point = solve(
        aniso, 17, dict(kind="v", nu0=0, nu1=2, nu2=2), cycles=3
    )
    r_line = solve(
        aniso,
        17,
        dict(kind="v", nu0=0, nu1=2, nu2=2, smoother="line-2"),
        cycles=3,
    )
    rho_point = r_point.residual_history[1] / r_point.residual_history[0]
    rho_line = r_line.residual_history[1] / r_line.residual_history[0]
    assert rho_line < 0.2
    assert rho_line < 0.5 * rho_point


def test_line_relaxation_isotropic_matches_accuracy():
    r = solve(
        Poisson(3),
        17,
        dict(kind="fmg", nu0=1, nu1=2, nu2=2, smoother="line-0"),
        cycles=2,
    )
    assert r.error_linf < 4e-3
    assert r.residual_history[-1] < 0.1 * r.residual_history[0]


def test_fmg_wcycle_line_anisotropic():
    """FMG + W-cycle + line relaxation combined (config 5 wording)."""
    aniso = Poisson(3, domain=((0.0, 1.0), (0.0, 1.0), (0.0, 0.1)))
    r = solve(
        aniso,
        17,
        dict(kind="fmg", nu0=1, nu1=2, nu2=2, mu=2, smoother="line-2"),
        cycles=2,
    )
    assert r.residual_history[-1] < 1e-1
    # oracle: sin*sin*sin on the squashed domain is not zero-boundary in z
    # only when domain is [0,L]; k*pi*x/L would be needed — use residual +
    # reduction as the check here
    assert r.residual_history[-1] < 0.05 * max(r.residual_history[0], 1e-9)


def test_exact_scan_solver_ode1d():
    """The associative-scan direct solve reaches near machine-precision
    residuals in one V-cycle (BASELINE.json config 1 scale, float64)."""
    r = solve(
        Ode1D(),
        1025,
        dict(kind="v", nu0=0, nu1=1, nu2=1, smoother="exact"),
        dtype="float64",
        cycles=3,
        tol=1e-8,
    )
    assert r.residual_l2 < 1e-8
    assert r.cycles_run <= 2
    assert r.error_l2 < 1.5e-3  # discretization (O(h))


def test_exact_scan_matches_heavily_relaxed_rbgs():
    """The scan solve and many RBGS sweeps agree (same fixed point)."""
    prob = Ode1D()
    h = Hierarchy.build(prob, 65, dtype=jnp.float64)
    lvl, geom = h.levels[0], h.geoms[0]
    v_exact = prob.exact_solve(lvl.v, lvl.f, geom, lvl.aux)
    v_relax = stencil.relax_rbgs(
        lambda v, f: prob.relax_update(v, f, geom, lvl.aux),
        lvl.v,
        lvl.f,
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        2000,
    )
    np.testing.assert_allclose(
        np.asarray(v_exact), np.asarray(v_relax), rtol=1e-8, atol=1e-10
    )

"""Cross-language parity: the C++ golden-model backend vs the JAX tiers.

The golden model (native/golden.cpp) is an independent implementation of
the corrected reference numerics; converged solutions from both stacks
must agree within float32 algebraic tolerance, and both must match the
analytic oracle at the discretization error."""

import shutil

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

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ unavailable"
)


def jax_solve(prob, n, kind, nu0, nu1, nu2, cycles=1):
    cfg = SolverConfig(
        cycle=CycleConfig(kind, nu0, nu1, nu2),
        max_cycles=cycles,
        tol=0.0,
    )
    s = MultigridSolver(prob, n, cfg)
    r = s.solve_to_tolerance()
    from pde_multigrid_tpu.grid import to_logical

    return to_logical(r.v, s.geoms[0]), r


@pytest.mark.parametrize(
    "prob,name,n,nu",
    [
        (Poisson(2), "poisson", 33, 2),
        (Poisson(3), "poisson", 17, 2),
        (Ode1D(), "ode1d", 65, 8),
        (Lyapunov2D(), "lyapunov2d", 33, 8),
    ],
    ids=["poisson2d", "poisson3d", "ode1d", "lyapunov2d"],
)
def test_golden_matches_jax_fmg(prob, name, n, nu):
    from pde_multigrid_tpu.utils.native import golden_solve

    v_jax, r = jax_solve(prob, n, "fmg", 2, nu, nu, cycles=2)
    v_cpp, res_cpp = golden_solve(
        name,
        (n,) * prob.ndim,
        prob.domain,
        kind="fmg",
        nu0=2,
        nu1=nu,
        nu2=nu,
        max_cycles=2,
    )
    # both stacks converged to the same discrete solution
    np.testing.assert_allclose(v_cpp, v_jax, rtol=5e-4, atol=5e-5)
    # and both residuals are at comparable (small) levels
    assert res_cpp < 10 * max(r.residual_l2, 1e-6)


def test_golden_vcycle_reduction():
    """The golden model shows the same textbook V-cycle contraction."""
    from pde_multigrid_tpu.utils.native import golden_solve

    _, r1 = golden_solve(
        "poisson", (33, 33), ((0.0, 1.0),) * 2, kind="v", nu1=2, nu2=2,
        max_cycles=1,
    )
    _, r3 = golden_solve(
        "poisson", (33, 33), ((0.0, 1.0),) * 2, kind="v", nu1=2, nu2=2,
        max_cycles=3,
    )
    assert r3 < 0.1 * r1


def test_golden_oracle_accuracy():
    from pde_multigrid_tpu.utils.native import golden_solve

    n = 65
    v, _ = golden_solve(
        "poisson", (n, n), ((0.0, 1.0),) * 2, kind="fmg", nu1=2, nu2=2
    )
    x = np.linspace(0, 1, n)
    exact = np.sin(np.pi * x)[:, None] * np.sin(np.pi * x)[None, :]
    assert np.max(np.abs(v - exact)[1:-1, 1:-1]) < 4e-4


def test_golden_hjb_fas_matches_jax():
    """The C++ golden model's FAS solve of the nonlinear HJB problem
    converges to the same discrete fixed point as the JAX solver —
    cross-language validation of both the upwind scheme and the FAS
    machinery (the reference never got this problem working at all)."""
    from pde_multigrid_tpu.utils.native import golden_solve

    v_cpp, res_cpp = golden_solve(
        "hjb2d",
        (33, 33),
        ((-1.0, 1.0), (-1.0, 1.0)),
        kind="v",
        nu1=3,
        nu2=3,
        max_cycles=30,
    )
    assert res_cpp < 1e-5

    from pde_multigrid_tpu import (
        CycleConfig,
        HJBMinTime,
        MultigridSolver,
        SolverConfig,
    )

    cfg = SolverConfig(
        cycle=CycleConfig("v", 1, 3, 3, scheme="fas"),
        tol=1e-8,
        max_cycles=30,
    )
    r = MultigridSolver(HJBMinTime(), 33, cfg).solve_to_tolerance()
    d = np.abs(v_cpp - np.asarray(r.v))
    assert d.max() < 1e-5

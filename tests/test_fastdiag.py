"""Fast-diagonalization exact coarse solver (ops/fastdiag.py) and the
coarsest='exact' cycle option."""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.ops import fastdiag


def test_fastdiag_solves_interior_exactly():
    """A v = f on the interior (v = 0 on boundary planes) to float32
    round-off, 3D wrap storage."""
    prob = Poisson(3)
    h = Hierarchy.build(prob, 33, wrap=True)
    geom, lvl = h.geoms[0], h.levels[0]
    rng = np.random.default_rng(3)
    f = jnp.asarray(
        (
            rng.standard_normal(geom.padded_shape)
            * np.asarray(lvl.aux["m_int"])
        ).astype(np.float32)
    )
    solve = fastdiag.make_fastdiag_solve(prob, geom)
    assert solve is not None
    v = solve(f)
    m = np.asarray(lvl.aux["m_int"])
    # boundary planes stay zero
    assert float(jnp.max(jnp.abs(v * (1 - m)))) == 0.0
    av = prob.apply_operator(v, geom, lvl.aux) * m
    r = np.asarray(av - f * m)
    scale = np.max(np.abs(np.asarray(f)))
    assert np.max(np.abs(r)) < 5e-4 * scale * (33**2)  # ~cond * eps


def test_fastdiag_anisotropic_spacing():
    """Unequal per-axis spacing exercises the per-axis eigenvalues."""
    prob = Poisson(3, domain=((0.0, 1.0), (0.0, 2.0), (0.0, 4.0)))
    h = Hierarchy.build(prob, 17, wrap=True)
    geom, lvl = h.geoms[0], h.levels[0]
    rng = np.random.default_rng(4)
    f = jnp.asarray(
        (
            rng.standard_normal(geom.padded_shape)
            * np.asarray(lvl.aux["m_int"])
        ).astype(np.float32)
    )
    v = fastdiag.make_fastdiag_solve(prob, geom)(f)
    m = np.asarray(lvl.aux["m_int"])
    av = prob.apply_operator(v, geom, lvl.aux) * m
    r = np.asarray(av - f * m)
    assert np.max(np.abs(r)) < 1e-3 * np.max(np.abs(np.asarray(f)))


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_exact_coarsest_converges(backend):
    """FMG with coarsest='exact' truncates the hierarchy (num_levels
    auto) and reaches discretization accuracy at least as well as the
    reference relax-to-the-bottom recursion."""
    n = 65
    cy = dict(nu0=1, nu1=8, nu2=8)
    s_exact = MultigridSolver(
        Poisson(3),
        n,
        SolverConfig(
            cycle=CycleConfig("fmg", coarsest="exact", **cy),
            backend=backend,
        ),
    )
    assert len(s_exact.geoms) == 2  # 65 -> 33, truncated
    s_relax = MultigridSolver(
        Poisson(3),
        n,
        SolverConfig(cycle=CycleConfig("fmg", **cy), backend=backend),
    )
    re = s_exact.solve()
    rr = s_relax.solve()
    h = 1.0 / (n - 1)
    # both sit at discretization accuracy (their difference is error-
    # cancellation luck, not solver quality — the algebraic fixed point
    # is identical); the residual reflects solver quality
    assert re.error_linf < 50 * h * h
    assert re.residual_l2 < 2 * rr.residual_l2


def test_exact_coarsest_config_validation():
    with pytest.raises(ValueError):
        CycleConfig("v", scheme="fas", coarsest="exact")
    # nonlinear problem: building the solver must fail loudly
    from pde_multigrid_tpu.models.hjb import HJBMinTime

    with pytest.raises(ValueError):
        MultigridSolver(
            HJBMinTime(),
            17,
            SolverConfig(
                cycle=CycleConfig("v", 1, 2, 2, coarsest="exact"),
                backend="jnp",
            ),
        )


def test_dense_coarse_solve_lyapunov():
    """The probed dense inverse solves a nonsymmetric one-sided-stencil
    problem with NONZERO Dirichlet data exactly at the coarsest level."""
    from pde_multigrid_tpu import Lyapunov2D
    from pde_multigrid_tpu.grid import Hierarchy

    prob = Lyapunov2D()
    h = Hierarchy.build(prob, 17)
    geom, lvl = h.geoms[0], h.levels[0]
    solve = fastdiag.make_dense_coarse_solve(prob, geom)
    assert solve is not None
    v = solve(lvl.v, lvl.f, lvl.aux)
    m_int = np.asarray(lvl.aux["m_int"])
    r = np.asarray(
        (lvl.f - prob.apply_operator(v, geom, lvl.aux)) * m_int
    )
    scale = max(np.max(np.abs(np.asarray(lvl.f))), 1.0)
    assert np.max(np.abs(r)) < 1e-3 * scale
    # boundary data preserved
    mb = np.asarray(lvl.aux["m_log"]) - m_int
    np.testing.assert_allclose(
        np.asarray(v) * mb, np.asarray(lvl.v) * mb, rtol=0, atol=0
    )


def test_exact_coarsest_lyapunov_end_to_end():
    """FMG with the dense exact coarsest on the Lyapunov problem:
    truncated hierarchy, converges to the analytic quadratic form."""
    from pde_multigrid_tpu import Lyapunov2D

    s = MultigridSolver(
        Lyapunov2D(),
        129,
        SolverConfig(
            cycle=CycleConfig("fmg", 1, 20, 20, coarsest="exact"),
            backend="jnp",
        ),
    )
    assert len(s.geoms) < 6  # truncated (full hierarchy would be 6)
    r = s.solve()
    s_ref = MultigridSolver(
        Lyapunov2D(),
        129,
        SolverConfig(cycle=CycleConfig("fmg", 1, 20, 20), backend="jnp"),
    )
    rr = s_ref.solve()
    # first-order scheme: O(h) error floor; match the reference run
    assert r.error_linf < 1.5 * rr.error_linf + 1e-6

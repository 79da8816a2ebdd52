"""Implicit-stencil operator layer + Galerkin (RAP) coarsening
(SURVEY.md §7 L3; BASELINE north-star sparse-operator requirement)."""

import numpy as np
import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
    VariableCoefficientPoisson,
)
from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.ops import galerkin as G

RNG = np.random.default_rng(11)


def test_stencil_apply_matches_problem_operator():
    for prob, n in [(Poisson(2), 17), (Poisson(3), 9)]:
        h = Hierarchy.build(prob, n)
        lvl, geom = h.levels[0], h.geoms[0]
        op = prob.stencil_operator(geom, lvl.aux)
        v = jnp.asarray(
            RNG.standard_normal(geom.padded_shape), jnp.float32
        )
        got = np.asarray(op.apply(v) * lvl.aux["m_int"])
        want = np.asarray(
            prob.apply_operator(v, geom, lvl.aux) * lvl.aux["m_int"]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_galerkin_1d_laplacian_exact():
    """Classic result: RAP of the 1D 3-point Laplacian with full weighting
    and linear interpolation IS the rediscretized coarse Laplacian."""
    prob = Poisson(1)
    h = Hierarchy.build(prob, 17)
    op_f = prob.stencil_operator(h.geoms[0], h.levels[0].aux)
    op_c = G.rap_coarsen(
        op_f, h.geoms[0], h.geoms[1], h.levels[0].aux, h.levels[1].aux
    )
    hc = h.geoms[1].spacing[0]
    coeffs = np.asarray(op_c.coeffs)
    m_int = np.asarray(h.levels[1].aux["m_int"], bool)
    k = {off: i for i, off in enumerate(op_c.offsets)}
    w = 1.0 / (hc * hc)
    np.testing.assert_allclose(
        coeffs[m_int][:, k[(0,)]], -2.0 * w, rtol=1e-4
    )
    # off-diagonals: w everywhere except the boundary-eliminated columns
    # (the coarse error is zero on the boundary, so those entries drop)
    np.testing.assert_allclose(coeffs[1:-2, k[(1,)]][m_int[1:-2]], w, rtol=1e-4)
    np.testing.assert_allclose(coeffs[2:-1, k[(-1,)]][m_int[2:-1]], w, rtol=1e-4)
    assert coeffs[1, k[(-1,)]] == 0.0 and coeffs[-2, k[(1,)]] == 0.0


def test_galerkin_action_matches_rap_2d():
    """A_c chi built by probing must equal R(A(P(chi))) for arbitrary
    coarse fields (validates the decoupling argument)."""
    prob = Poisson(2)
    h = Hierarchy.build(prob, 17)
    gf, gc = h.geoms[0], h.geoms[1]
    af, ac = h.levels[0].aux, h.levels[1].aux
    op_f = prob.stencil_operator(gf, af)
    op_c = G.rap_coarsen(op_f, gf, gc, af, ac)
    x = jnp.asarray(RNG.standard_normal(gc.padded_shape), jnp.float32)
    from pde_multigrid_tpu.ops import stencil as S

    e = S.prolong_linear(x, gf.padded_shape) * af["m_int"]
    want = S.restrict_full_weighting(
        op_f.apply(e) * af["m_int"], ac["m_int"], ac["m_log"]
    )
    got = op_c.apply(x) * ac["m_int"]
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(want * ac["m_int"]),
        rtol=2e-4,
        atol=2e-4,
    )


def test_csr_assembly_matvec_parity():
    prob = Poisson(2)
    h = Hierarchy.build(prob, 9)
    lvl, geom = h.levels[0], h.geoms[0]
    op = prob.stencil_operator(geom, lvl.aux)
    shape = geom.padded_shape
    m_int = np.asarray(lvl.aux["m_int"], bool)
    indptr, indices, data = op.to_csr(shape, m_int)
    v = RNG.standard_normal(shape).astype(np.float32)
    flat = v.ravel()
    y = np.zeros_like(flat, dtype=np.float64)
    for r in range(len(indptr) - 1):
        y[r] = data[indptr[r] : indptr[r + 1]] @ flat[
            indices[indptr[r] : indptr[r + 1]]
        ]
    want = np.asarray(op.apply(jnp.asarray(v)) * lvl.aux["m_int"])
    np.testing.assert_allclose(
        y.reshape(shape)[m_int], want[m_int], rtol=1e-4, atol=1e-4
    )


def test_bcoo_assembly_matvec_parity():
    prob = Poisson(1)
    h = Hierarchy.build(prob, 17)
    lvl, geom = h.levels[0], h.geoms[0]
    op = prob.stencil_operator(geom, lvl.aux)
    m_int = np.asarray(lvl.aux["m_int"], bool)
    mat = op.to_bcoo(geom.padded_shape, m_int)
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape), jnp.float32
    )
    got = np.asarray(mat @ v.ravel()).reshape(geom.padded_shape)
    want = np.asarray(op.apply(v))
    np.testing.assert_allclose(
        got[m_int], want[m_int], rtol=1e-4, atol=1e-4
    )


def test_galerkin_vcycle_converges_poisson2d():
    cfg = SolverConfig(
        cycle=CycleConfig(
            "v", 0, 2, 2, coarse_operator="galerkin"
        ),
        max_cycles=4,
        tol=0.0,
    )
    r = MultigridSolver(Poisson(2), 65, cfg).solve_to_tolerance()
    hh = r.residual_history
    assert hh[1] / hh[0] < 0.15
    assert r.error_linf < 4e-4


def test_variable_coefficient_galerkin_vs_rediscretize():
    """Variable-coefficient diffusion with a discretely manufactured
    solution: both coarse-operator modes must converge to the oracle
    (no discretization floor), Galerkin at least as fast."""
    prob = VariableCoefficientPoisson(2)
    histories = {}
    for mode in ("galerkin", "rediscretize"):
        cfg = SolverConfig(
            cycle=CycleConfig("v", 0, 2, 2, coarse_operator=mode),
            max_cycles=8,
            tol=0.0,
        )
        r = MultigridSolver(prob, 65, cfg).solve_to_tolerance()
        histories[mode] = r.residual_history
        assert r.error_linf < 5e-6, mode  # algebraic convergence
    # compare early-cycle rho (later cycles sit on the float32 floor)
    rho_g = histories["galerkin"][1] / histories["galerkin"][0]
    rho_r = histories["rediscretize"][1] / histories["rediscretize"][0]
    assert rho_g < 0.25
    assert rho_g < rho_r * 1.5  # at least comparable


def test_galerkin_fmg_poisson3d():
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2, coarse_operator="galerkin"),
        max_cycles=1,
        tol=0.0,
    )
    r = MultigridSolver(Poisson(3), 17, cfg).solve_to_tolerance()
    assert r.error_linf < 6e-3


def test_galerkin_wrap_storage_matches_padded():
    """Galerkin x wrap storage (solver.py): the wrap-probed RAP hierarchy
    must converge identically to the padded-storage one (no silent
    storage downgrade; VERDICT r2 weak #7)."""
    from pde_multigrid_tpu.grid import to_logical

    results = {}
    for storage in ("wrap", "padded"):
        cfg = SolverConfig(
            cycle=CycleConfig("v", 0, 2, 2, coarse_operator="galerkin"),
            max_cycles=4,
            tol=0.0,
            storage=storage,
        )
        s = MultigridSolver(Poisson(2), 65, cfg)
        assert s.geoms[0].wrap == (storage == "wrap")
        r = s.solve_to_tolerance()
        hh = r.residual_history
        assert hh[1] / hh[0] < 0.15, storage  # textbook rho under wrap too
        assert r.error_linf < 4e-4, storage
        results[storage] = np.asarray(to_logical(r.v, s.geoms[0]))
    np.testing.assert_allclose(
        results["wrap"], results["padded"], rtol=1e-4, atol=1e-6
    )

"""HJB minimum-time problem (thesis §3.3) and FAS nonlinear multigrid.

The reference never implemented this problem (thesis p. 62: results "non
costituivano una valida approssimazione"); these tests pin down that the
framework's FAS + monotone-upwind combination actually solves it — and
that the thesis' own forward-difference scheme fails as reported.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    HJBMinTime,
    MultigridSolver,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.models.hjb import min_time_double_integrator


def test_min_time_oracle_properties():
    """Closed-form minimum time: zero at the origin, continuous across
    the switching curve, satisfies the HJB PDE away from kinks."""
    assert float(min_time_double_integrator(0.0, 0.0)) == 0.0
    # on the switching curve (x2 > 0 branch): T = x2 exactly
    for x2 in (0.25, 0.7):
        x1 = -0.5 * x2 * x2
        np.testing.assert_allclose(
            float(min_time_double_integrator(x1, x2)), x2, rtol=1e-6
        )
    # PDE check 1 + x2 T_x1 - |T_x2| = 0 by central differences at
    # smooth points
    rng = np.random.default_rng(3)
    eps = 1e-5
    for _ in range(20):
        x1, x2 = rng.uniform(-0.9, 0.9, 2)
        if abs(x1 + 0.5 * x2 * abs(x2)) < 0.05 or x1 * x1 + x2 * x2 < 0.04:
            continue  # skip kink / target neighborhoods
        tx1 = (
            float(min_time_double_integrator(x1 + eps, x2))
            - float(min_time_double_integrator(x1 - eps, x2))
        ) / (2 * eps)
        tx2 = (
            float(min_time_double_integrator(x1, x2 + eps))
            - float(min_time_double_integrator(x1, x2 - eps))
        ) / (2 * eps)
        assert abs(1.0 + x2 * tx1 - abs(tx2)) < 1e-3


def test_fas_equals_cs_on_linear_problem():
    """FAS reduces to the correction scheme for linear operators."""
    kw = dict(tol=1e-10, max_cycles=6)
    r_cs = MultigridSolver(
        Poisson(2),
        65,
        SolverConfig(cycle=CycleConfig("v", 0, 2, 2, scheme="cs"), **kw),
    ).solve_to_tolerance()
    r_fas = MultigridSolver(
        Poisson(2),
        65,
        SolverConfig(cycle=CycleConfig("v", 0, 2, 2, scheme="fas"), **kw),
    ).solve_to_tolerance()
    assert abs(r_cs.error_linf - r_fas.error_linf) < 1e-5
    # same asymptotic convergence factor (identical in exact arithmetic;
    # f32 rounding of the injected-solution terms gives a small drift)
    rho_cs = r_cs.residual_history[-1] / r_cs.residual_history[-2]
    rho_fas = r_fas.residual_history[-1] / r_fas.residual_history[-2]
    assert abs(rho_cs - rho_fas) < 0.15


def test_hjb_upwind_fas_converges():
    """The monotone upwind scheme + FAS drives the nonlinear discrete
    system to small residual, and the error sits in the envelope
    cross-validated against an independent semi-Lagrangian scheme."""
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 3, 3, scheme="fas"),
        tol=1e-6,
        max_cycles=40,
    )
    r = MultigridSolver(HJBMinTime(), 65, cfg).solve_to_tolerance()
    assert not r.diverged
    assert r.residual_l2 < 1e-5
    assert r.error_linf < 0.25  # kink-limited first-order envelope
    assert r.error_l2 < 0.10


def test_hjb_fas_beats_cs():
    """On the nonlinear problem FAS converges the residual far faster
    than the (formally inapplicable) linear correction scheme."""
    mk = lambda scheme: MultigridSolver(
        HJBMinTime(),
        65,
        SolverConfig(
            cycle=CycleConfig("v", 1, 3, 3, scheme=scheme),
            tol=1e-9,
            max_cycles=8,
        ),
    ).solve_to_tolerance()
    r_fas, r_cs = mk("fas"), mk("cs")
    assert r_fas.residual_l2 < 0.2 * r_cs.residual_l2


def test_hjb_tesi_scheme_diverges_as_reported():
    """Thesis eq. 3.3.17 verbatim (forward differences, sign branches)
    is not monotone for x2 < 0; the divergence guard must flag it —
    empirical confirmation of why the thesis dropped the problem."""
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 3, 3, scheme="fas"),
        tol=1e-7,
        max_cycles=5,
    )
    r = MultigridSolver(HJBMinTime(scheme="tesi"), 65, cfg).solve_to_tolerance()
    assert r.diverged or r.residual_l2 > 1.0


def _solve_hjb(n):
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 3, 3, scheme="fas"),
        tol=1e-7,
        max_cycles=40,
    )
    s = MultigridSolver(HJBMinTime(), n, cfg)
    r = s.solve_to_tolerance()
    assert not r.diverged
    return s, r


def test_hjb_convergence_order_pinned():
    """Empirical L-inf convergence order vs the closed-form oracle over
    n in {65, 129, 257, 513} (VERDICT r3 #5: rate-pin the accuracy).

    The classical O(sqrt(h)) viscosity-solution rate does NOT hold for
    this problem: the min-time function has an INFINITE gradient on the
    switching curve itself (right branch T = x2 + 2 sqrt(x2^2/2 + x1),
    so T_x1 = 1/sqrt(x2^2/2 + x1) -> inf as x1 -> -x2^2/2+), i.e. the
    value function is Holder-1/2 there, not Lipschitz-with-kinks; and
    because every optimal trajectory passes near the curve, the O(1)
    truncation at the curve pollutes the whole upstream domain.  Any
    first-order monotone scheme therefore measures ~h^0.2 GLOBALLY —
    confirmed by an independent semi-Lagrangian value iteration (same
    envelope within 9%, same order; see
    test_hjb_matches_independent_semilagrangian).  Pinned measurements
    (f32, FMG(1,3,3) FAS to 1e-7): 0.2032 / 0.1840 / 0.1625 / 0.1406,
    least-squares order 0.176."""
    import math

    pinned = {65: 0.2032, 129: 0.1840, 257: 0.1625, 513: 0.1406}
    errs = []
    for n, ref in pinned.items():
        s, r = _solve_hjb(n)
        assert r.residual_l2 < 1e-4
        err = float(r.error_linf)
        errs.append(err)
        # envelope: no worse than 10% above the pinned value, and not
        # suspiciously below it (a large sudden "improvement" means the
        # measurement broke — first-order monotone schemes cannot beat
        # the Holder-1/2 regularity limit)
        assert 0.5 * ref < err < 1.10 * ref, (n, err, ref)
    # least-squares fit of log(err) vs log(h): order in the pinned band
    xs = [math.log(2.0 / (n - 1)) for n in pinned]
    ys = [math.log(e) for e in errs]
    xm, ym = sum(xs) / len(xs), sum(ys) / len(ys)
    p = sum((x - xm) * (y - ym) for x, y in zip(xs, ys)) / sum(
        (x - xm) ** 2 for x in xs
    )
    assert 0.10 < p < 0.30, f"empirical order {p:.3f} left the pinned band"


def _semi_lagrangian_solve(n, sweeps):
    """Independent cross-check: Kruzkov semi-Lagrangian value iteration
    (bilinear interpolation, u in {-1, +1}) — shares NO code with the
    upwind/Godunov discretization or the FAS solver."""
    import jax

    xs = np.linspace(-1, 1, n).astype(np.float32)
    x1, x2 = np.meshgrid(xs, xs, indexing="ij")
    h = 2.0 / (n - 1)
    t = np.asarray(
        min_time_double_integrator(jnp.asarray(x1), jnp.asarray(x2))
    )
    w_exact = 1.0 - np.exp(-t)
    dt = 0.5 * h
    disc = np.exp(-dt)
    x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)
    pin = (x1 * x1 + x2 * x2) <= (2 * h) ** 2  # same anchor as HJBMinTime
    bnd = np.zeros((n, n), bool)
    bnd[0, :] = bnd[-1, :] = bnd[:, 0] = bnd[:, -1] = True
    fixed = jnp.asarray(pin | bnd)
    w_fix = jnp.asarray(w_exact)

    def interp(w, a1, a2):
        g1, g2 = (a1 + 1.0) / h, (a2 + 1.0) / h
        i = jnp.clip(jnp.floor(g1).astype(jnp.int32), 0, n - 2)
        j = jnp.clip(jnp.floor(g2).astype(jnp.int32), 0, n - 2)
        a = jnp.clip(g1 - i, 0, 1)
        b = jnp.clip(g2 - j, 0, 1)
        return (
            (1 - a) * (1 - b) * w[i, j]
            + a * (1 - b) * w[i + 1, j]
            + (1 - a) * b * w[i, j + 1]
            + a * b * w[i + 1, j + 1]
        )

    @jax.jit
    def step(w):
        cands = [
            1.0
            - disc
            + disc
            * interp(
                w,
                jnp.clip(x1j + dt * x2j, -1, 1),
                jnp.clip(x2j + dt * u, -1, 1),
            )
            for u in (-1.0, 1.0)
        ]
        return jnp.where(fixed, w_fix, jnp.minimum(*cands))

    w = jnp.where(fixed, w_fix, jnp.ones((n, n), jnp.float32))
    for _ in range(sweeps):
        w = step(w)
    return np.asarray(w), pin | bnd


def test_hjb_matches_independent_semilagrangian():
    """Two structurally unrelated discretizations of the same HJB agree
    to ~0.017 L-inf while each sits ~0.19 from the exact solution: the
    error envelope is the discretization-order limit of the problem
    (Holder-1/2 value function, see test_hjb_convergence_order_pinned),
    not a solver artifact.  Measured gaps: 0.0171 (n=65), 0.0156
    (n=129)."""
    n = 65
    w_sl, excl = _semi_lagrangian_solve(n, sweeps=20 * (n - 1))
    s, r = _solve_hjb(n)
    w_mg = np.asarray(r.v)[:n, :n]
    gap = np.abs(w_mg - w_sl)
    gap[excl] = 0.0
    assert gap.max() < 0.030, gap.max()


def test_fas_galerkin_rejected():
    with pytest.raises(ValueError):
        CycleConfig("v", 1, 2, 2, scheme="fas", coarse_operator="galerkin")


def test_fmg_preserves_pinned_anchor_cells():
    """cycles.fmg re-imposes the Dirichlet ring from the hoisted
    aux['bv_ring'] (models/base.py); HJB pins extra interior anchor
    cells AFTER the base init built that ring, so it must rebuild it —
    regression: a stale ring zeroed the W(0)=0 anchor ball every FMG
    step (exact values replaced by 0, max error 0.63)."""
    import jax.numpy as jnp

    prob = HJBMinTime()
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2, scheme="fas"), max_cycles=1
    )
    solver = MultigridSolver(prob, 17, cfg)
    levels = solver.fresh_levels()
    lvl0, geom = levels[0], solver.geoms[0]
    pinned = np.asarray(
        (lvl0.aux["m_log"] - lvl0.aux["m_int"]) > 0.5
    ) & np.asarray(lvl0.aux["m_int"] == 0)  # ring + pinned ball
    exact = np.asarray(
        prob.exact_solution(geom.coords(jnp.float32)), np.float32
    )
    out = solver.program.solve_step(tuple(levels))
    got = np.asarray(out[0].v)
    np.testing.assert_allclose(
        got[pinned], exact[pinned], rtol=0, atol=1e-6
    )


def test_hjb_kernel_tier_matches_jnp():
    """HJB dense Pallas kernels (resident tier via kernel_update +
    kernel_keep_mask) == the jnp tier, INCLUDING the pinned target ball
    (the keep-mask hook must mirror init_level's mask exclusion)."""
    import numpy as np
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.ops import stencil
    from pde_multigrid_tpu.ops.pallas import relax as R

    rng = np.random.default_rng(7)
    for scheme, tier in (
        ("upwind", "resident"),
        ("tesi", "resident"),
        # the slab tier computes its own hoisted masks: it must apply the
        # keep-mask hook too (regression: pinned ball was updated there,
        # wrecking the 513^2 bench solve)
        ("upwind", "slab"),
        # the color-split slab applies kernel_keep_mask per color
        # in-kernel (round 4: HJB's split_update2d tier)
        ("upwind", "split"),
    ):
        prob = HJBMinTime(scheme=scheme)
        h = Hierarchy.build(prob, 33, pad_last_to=128, pad_sublane_to=8)
        lvl, geom = h.levels[0], h.geoms[0]
        if tier == "slab":
            fn = R.make_slab_relax(
                prob, geom, jnp.float32, 8, 4, interpret=True
            )
        elif tier == "split":
            fn = R.make_split_color_slab_2d(
                prob, geom, jnp.float32, 8, sweeps_per_call=4,
                interpret=True,
            )
        else:
            fn = R.make_resident_relax(
                prob, geom, jnp.float32, interpret=True
            )
        v0 = lvl.v + 0.01 * jnp.asarray(
            rng.standard_normal(geom.padded_shape), jnp.float32
        ) * lvl.aux["m_int"]
        f = jnp.asarray(
            rng.standard_normal(geom.padded_shape) * 0.1 + 1.0,
            jnp.float32,
        )
        for ns in (1, 4):
            got = np.asarray(fn(v0, f, ns))
            want = np.asarray(
                stencil.relax_rbgs(
                    lambda vv, ff: prob.relax_update(vv, ff, geom, lvl.aux),
                    v0, f, lvl.aux["m_red"], lvl.aux["m_black"], ns,
                )
            )
            np.testing.assert_allclose(
                got, want, rtol=3e-5, atol=3e-6,
                err_msg=f"{scheme} ns={ns}",
            )
            if scheme == "upwind":
                # pinned ball untouched (same values as the input); the
                # tesi scheme's sign-flipping denominators poison masked
                # points with 0*inf NaNs in BOTH tiers (its documented
                # failure mode), so only the production scheme checks
                pin = np.asarray(lvl.aux["m_log"] - lvl.aux["m_int"]) > 0
                sl = pin[: got.shape[0], : got.shape[1]]
                np.testing.assert_array_equal(
                    got[sl], np.asarray(v0)[sl]
                )


def test_hjb_full_solve_pallas_backend():
    """Full FAS FMG solve on the forced-Pallas backend == jnp backend."""
    import numpy as np

    res = {}
    for backend in ("jnp", "pallas"):
        cfg = SolverConfig(
            cycle=CycleConfig("fmg", 1, 8, 8, scheme="fas"),
            backend=backend,
            max_cycles=2,
            tol=0.0,
            pad_last_to=128 if backend == "pallas" else 1,
            pad_sublane_to=8 if backend == "pallas" else 1,
        )
        r = MultigridSolver(HJBMinTime(), 33, cfg).solve_to_tolerance()
        assert not r.diverged
        res[backend] = r
    assert abs(res["pallas"].error_linf - res["jnp"].error_linf) < 1e-4

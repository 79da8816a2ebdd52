"""Unit tests of the six core ops against hand-computed stencils and naive
loop implementations (SURVEY.md §4 implication (c))."""

import numpy as np
import jax.numpy as jnp

from pde_multigrid_tpu.grid import (
    Hierarchy,
    interior_mask,
    parity_mask,
)
from pde_multigrid_tpu.models import Poisson, Lyapunov2D, Ode1D
from pde_multigrid_tpu.ops import stencil

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------- restriction


def test_restrict_1d_weights():
    fine = RNG.standard_normal(9).astype(np.float32)
    m_int_c = interior_mask((5,)).astype(np.float32)
    coarse = np.asarray(
        stencil.restrict_full_weighting(jnp.asarray(fine), jnp.asarray(m_int_c))
    )
    # interior: 1/4 (O + 2C + E) at fine index 2c (MultiGrid1D.cpp:56)
    for c in (1, 2, 3):
        expect = 0.25 * (fine[2 * c - 1] + 2 * fine[2 * c] + fine[2 * c + 1])
        np.testing.assert_allclose(coarse[c], expect, rtol=1e-6)
    # boundary: injection
    assert coarse[0] == fine[0] and coarse[4] == fine[8]


def test_restrict_2d_weights():
    fine = RNG.standard_normal((9, 9)).astype(np.float32)
    m_int_c = interior_mask((5, 5)).astype(np.float32)
    coarse = np.asarray(
        stencil.restrict_full_weighting(jnp.asarray(fine), jnp.asarray(m_int_c))
    )
    # 9-point kernel 1/16 [[1,2,1],[2,4,2],[1,2,1]] (MultiGrid2D.cpp:123)
    k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float64) / 16.0
    for cy in (1, 3):
        for cx in (2,):
            patch = fine[2 * cx - 1 : 2 * cx + 2, 2 * cy - 1 : 2 * cy + 2]
            np.testing.assert_allclose(
                coarse[cx, cy], (k * patch).sum(), rtol=1e-5
            )
    assert coarse[0, 2] == fine[0, 4]  # edge injection


def test_restrict_3d_weights():
    fine = RNG.standard_normal((5, 5, 5)).astype(np.float32)
    m_int_c = interior_mask((3, 3, 3)).astype(np.float32)
    coarse = np.asarray(
        stencil.restrict_full_weighting(jnp.asarray(fine), jnp.asarray(m_int_c))
    )
    # 27-point kernel: separable [1,2,1]^3 / 64 -> center 1/8, face 1/16,
    # edge 1/32, corner 1/64 (MultiGrid3D.cpp:50-184)
    k1 = np.array([1.0, 2.0, 1.0]) / 4.0
    k = np.einsum("i,j,k->ijk", k1, k1, k1)
    assert abs(k[1, 1, 1] - 1 / 8) < 1e-12
    assert abs(k[0, 1, 1] - 1 / 16) < 1e-12
    assert abs(k[0, 0, 1] - 1 / 32) < 1e-12
    assert abs(k[0, 0, 0] - 1 / 64) < 1e-12
    patch = fine[1:4, 1:4, 1:4]
    np.testing.assert_allclose(coarse[1, 1, 1], (k * patch).sum(), rtol=1e-5)


# --------------------------------------------------------------- prolongation


def test_prolong_1d_cases():
    coarse = RNG.standard_normal(5).astype(np.float32)
    fine = np.asarray(stencil.prolong_linear(jnp.asarray(coarse)))
    assert fine.shape == (9,)
    for i in range(5):
        np.testing.assert_allclose(fine[2 * i], coarse[i], rtol=1e-6)
    for i in range(4):
        np.testing.assert_allclose(
            fine[2 * i + 1], 0.5 * (coarse[i] + coarse[i + 1]), rtol=1e-6
        )


def test_prolong_2d_parity_cases():
    coarse = RNG.standard_normal((3, 3)).astype(np.float32)
    fine = np.asarray(stencil.prolong_linear(jnp.asarray(coarse)))
    assert fine.shape == (5, 5)
    # the reference's 4 parity cases (MultiGrid2D.cpp:128-196)
    np.testing.assert_allclose(fine[2, 2], coarse[1, 1], rtol=1e-6)  # even/even
    np.testing.assert_allclose(  # odd x, even y
        fine[1, 2], 0.5 * (coarse[0, 1] + coarse[1, 1]), rtol=1e-6
    )
    np.testing.assert_allclose(  # even x, odd y
        fine[2, 1], 0.5 * (coarse[1, 0] + coarse[1, 1]), rtol=1e-6
    )
    np.testing.assert_allclose(  # odd/odd: 4-point average
        fine[1, 1],
        0.25 * (coarse[0, 0] + coarse[0, 1] + coarse[1, 0] + coarse[1, 1]),
        rtol=1e-6,
    )


def test_prolong_3d_odd_odd_odd():
    coarse = RNG.standard_normal((3, 3, 3)).astype(np.float32)
    fine = np.asarray(stencil.prolong_linear(jnp.asarray(coarse)))
    assert fine.shape == (5, 5, 5)
    # 8-point average (reference case DDD, MultiGrid3D.cpp:186-335)
    np.testing.assert_allclose(
        fine[1, 1, 1], coarse[0:2, 0:2, 0:2].mean(), rtol=1e-5
    )


# ------------------------------------------------------- red-black relaxation


def _naive_rbgs_poisson2d(v, f, h, sweeps):
    """Straight-line transcription of the reference's colored loops
    (MultiGrid2D-style, Poisson operator) for cross-checking."""
    v = v.copy()
    n0, n1 = v.shape
    inv_h2 = 1.0 / (h * h)
    for _ in range(sweeps):
        for color in (0, 1):
            upd = v.copy()
            for i in range(1, n0 - 1):
                for j in range(1, n1 - 1):
                    if (i + j) % 2 == color:
                        upd[i, j] = (
                            (v[i - 1, j] + v[i + 1, j]) * inv_h2
                            + (v[i, j - 1] + v[i, j + 1]) * inv_h2
                            - f[i, j]
                        ) / (4.0 * inv_h2)
            v = upd
    return v


def test_rbgs_poisson2d_matches_naive_loop():
    prob = Poisson(2)
    h = Hierarchy.build(prob, 9)
    lvl, geom = h.levels[0], h.geoms[0]
    v0 = RNG.standard_normal((9, 9)).astype(np.float32)
    f0 = RNG.standard_normal((9, 9)).astype(np.float32)
    got = stencil.relax_rbgs(
        lambda v, f: prob.relax_update(v, f, geom, lvl.aux),
        jnp.asarray(v0),
        jnp.asarray(f0),
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        nsweeps=3,
    )
    want = _naive_rbgs_poisson2d(
        v0.astype(np.float64), f0.astype(np.float64), geom.spacing[0], 3
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_rbgs_red_black_ordering_matters():
    """Black points must see freshly-updated red values (Gauss-Seidel, not
    Jacobi): after one sweep from v=0, black updates differ from what they
    would be against the old red values."""
    prob = Poisson(1)
    h = Hierarchy.build(prob, 9)
    lvl, geom = h.levels[0], h.geoms[0]
    f = jnp.ones((9,), jnp.float32)
    v1 = stencil.relax_rbgs(
        lambda v, ff: prob.relax_update(v, ff, geom, lvl.aux),
        jnp.zeros((9,), jnp.float32),
        f,
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        1,
    )
    # pure Jacobi from zero would give -f h^2/2 at every interior point;
    # black points (odd idx) must differ because red neighbors moved first
    hx = geom.spacing[0]
    jacobi = -hx * hx / 2.0
    v1 = np.asarray(v1)
    np.testing.assert_allclose(v1[2], jacobi, rtol=1e-5)  # red point
    assert abs(v1[1] - jacobi) > 1e-6  # black point saw new red values


def test_relax_update_lyapunov_formula():
    """Pointwise check of the Lyapunov local solve against the thesis
    eq. 3.2.27 formula evaluated by hand."""
    prob = Lyapunov2D()
    h = Hierarchy.build(prob, 5)
    lvl, geom = h.levels[0], h.geoms[0]
    v = RNG.standard_normal((5, 5)).astype(np.float32)
    f = RNG.standard_normal((5, 5)).astype(np.float32)
    upd = np.asarray(
        prob.relax_update(jnp.asarray(v), jnp.asarray(f), geom, lvl.aux)
    )
    hx = hy = geom.spacing[0]
    i, j = 2, 1
    x, y = i * hx, j * hy
    k1 = -1.0 * x + -2.0 * y
    k2 = 0.0 * x + -3.0 * y
    den = k1 * hy + k2 * hx - 2.0 * hx * hy
    want = (hy * k1 * v[i + 1, j] + hx * k2 * v[i, j + 1] - f[i, j] * hx * hy) / den
    np.testing.assert_allclose(upd[i, j], want, rtol=1e-5)


def test_relax_update_ode1d_formula():
    prob = Ode1D()
    h = Hierarchy.build(prob, 9)
    lvl, geom = h.levels[0], h.geoms[0]
    v = RNG.standard_normal(9).astype(np.float32)
    f = RNG.standard_normal(9).astype(np.float32)
    upd = np.asarray(
        prob.relax_update(jnp.asarray(v), jnp.asarray(f), geom, lvl.aux)
    )
    hx = geom.spacing[0]
    j = 3
    epx = np.exp(j * hx) + 1.0
    want = (v[j + 1] * epx - f[j] * hx * epx) / (epx + hx)
    np.testing.assert_allclose(upd[j], want, rtol=1e-5)


# ----------------------------------------------------- residual / correction


def test_residual_zero_for_exact_discrete_solution_1d():
    """r = f - L v must vanish when v satisfies the discrete equations."""
    prob = Poisson(1)
    h = Hierarchy.build(prob, 17)
    lvl, geom = h.levels[0], h.geoms[0]
    # manufacture: pick v, compute f = L v, then residual must be ~0
    v = jnp.asarray(RNG.standard_normal(17).astype(np.float32))
    f = prob.apply_operator(v, geom, lvl.aux)
    r = stencil.residual(
        lambda vv: prob.apply_operator(vv, geom, lvl.aux),
        v,
        f,
        lvl.aux["m_int"],
    )
    assert float(jnp.max(jnp.abs(r))) < 1e-5


def test_residual_sign_3d_symmetric():
    """The corrected 3D residual: r = f - lap(v). For v = x^2 (boundary
    garbage masked), lap = 2 -> r = f - 2 at interior points.  Guards against
    re-introducing the reference's S/U sign typos (SURVEY.md §2.7.3)."""
    prob = Poisson(3)
    h = Hierarchy.build(prob, 5)
    lvl, geom = h.levels[0], h.geoms[0]
    x = geom.coords()[0]
    v = x * x
    f = jnp.full(v.shape, 5.0, jnp.float32)
    r = stencil.residual(
        lambda vv: prob.apply_operator(vv, geom, lvl.aux),
        v,
        f,
        lvl.aux["m_int"],
    )
    r = np.asarray(r)
    m = interior_mask((5, 5, 5))
    np.testing.assert_allclose(r[m], 3.0, rtol=1e-4)
    assert np.all(r[~m] == 0.0)


def test_apply_correction_interior_only():
    v = jnp.zeros((5, 5), jnp.float32)
    e = jnp.ones((5, 5), jnp.float32)
    m = jnp.asarray(interior_mask((5, 5)), jnp.float32)
    out = np.asarray(stencil.apply_correction(v, e, m))
    assert out[2, 2] == 1.0 and out[0, 0] == 0.0


def test_set_interior():
    v = jnp.full((5,), 7.0, jnp.float32)
    m = jnp.asarray(interior_mask((5,)), jnp.float32)
    out = np.asarray(stencil.set_interior(v, 0.0, m))
    np.testing.assert_allclose(out, [7.0, 0.0, 0.0, 0.0, 7.0])


def test_xla_mxu_transfers_match_jnp_tier_wrap3d():
    """XLA-level MXU pick-matrix transfers (ops/pallas/transfer.py::
    make_xla_restrict / make_xla_prolong) == the jnp tier on wrap-3D
    pairs.  These serve 512^3-and-up level pairs where the fused Pallas
    transfer kernels' VMEM stack busts and the jnp tier's reshape-split
    subsample relayouts cost ~10x roofline (26.8 ms/restrict at 512^3,
    VERDICT r3 #6); Precision.HIGHEST keeps them f32-accurate (the
    kernels' hi/lo-split trick gets algebraically merged away by XLA —
    measured bf16-sized errors — so it cannot be used here)."""
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.models import Poisson
    from pde_multigrid_tpu.ops.pallas import transfer as T

    prob = Poisson(3)
    h = Hierarchy.build(prob, 33, wrap=True)
    g0, g1 = h.geoms[0], h.geoms[1]
    aux1 = h.levels[1].aux
    assert T.xla_pair_ok(g0, g1) is False  # gate: MXU-worthy sizes only
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.standard_normal(g0.padded_shape), jnp.float32)
    c = jnp.asarray(rng.standard_normal(g1.padded_shape), jnp.float32)
    xr = T.make_xla_restrict(g0, g1, jnp.float32)
    got = np.asarray(xr(a, aux1["m_int"], aux1["m_log"]))
    want = np.asarray(
        stencil.restrict_full_weighting(a, aux1["m_int"], aux1["m_log"])
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    xp = T.make_xla_prolong(g1, g0, jnp.float32)
    got = np.asarray(xp(c))
    want = np.asarray(
        stencil.prolong_linear(c, g0.padded_shape, periodic=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_xla_mxu_transfers_match_jnp_tier_2d(monkeypatch):
    monkeypatch.setenv("PDE_MG_XLA2D_MIN_Y", "256")  # default-off tier
    """2D non-wrap XLA MXU pick-matrix transfers (make_xla_restrict_2d /
    make_xla_prolong_2d) == the jnp tier on padded 2D pairs, for an
    ARBITRARY (problem-modified) coarse interior mask — the semantics
    every 2D problem family (Lyapunov, HJB pinned-ball, varcoef) needs.
    These serve the big 2D level pairs whose jnp-tier lane-dim relayouts
    dominated the 4097^2 per-step fixed cost (VERDICT r4 #2).  Prolong
    parity is checked m_int-masked: fine PADDING rows carry zeros here
    vs upsampled-padding garbage in the jnp tier, and every consumer
    masks (cycles.py)."""
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.models import Lyapunov2D
    from pde_multigrid_tpu.ops.pallas import transfer as T

    prob = Lyapunov2D()
    h = Hierarchy.build(prob, 513, pad_last_to=128, pad_sublane_to=8)
    g0, g1 = h.geoms[0], h.geoms[1]
    assert T.xla_pair_ok_2d(g0, g1) is True
    assert T.xla_pair_ok_2d(h.geoms[-2], h.geoms[-1]) is False  # tiny
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal(g0.padded_shape), jnp.float32)
    c = jnp.asarray(rng.standard_normal(g1.padded_shape), jnp.float32)
    # modified interior mask (HJB-style pinned points inside the domain)
    m_int = np.array(h.levels[1].aux["m_int"])
    m_int[10:14, 17:21] = 0.0
    m_int = jnp.asarray(m_int)
    m_log = h.levels[1].aux["m_log"]
    xr = T.make_xla_restrict_2d(g0, g1, jnp.float32)
    got = np.asarray(xr(a, m_int, m_log))
    want = np.asarray(
        stencil.restrict_full_weighting(a, m_int, m_log)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # edge-injection fast path (pure geometric m_int: half the
    # full-volume contractions; Lyapunov/varcoef qualify)
    xr_e = T.make_xla_restrict_2d(
        g0, g1, jnp.float32, edge_injection=True
    )
    got = np.asarray(xr_e(a, h.levels[1].aux["m_int"], m_log))
    want = np.asarray(
        stencil.restrict_full_weighting(
            a, h.levels[1].aux["m_int"], m_log
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    xp = T.make_xla_prolong_2d(g1, g0, jnp.float32)
    m_int_f = np.asarray(h.levels[0].aux["m_int"])
    got = np.asarray(xp(c)) * m_int_f
    want = (
        np.asarray(stencil.prolong_linear(c, g0.padded_shape)) * m_int_f
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_xla_2d_transfer_routing_in_pallas_and_galerkin_tiers(
    monkeypatch,
):
    """PallasKernels and GalerkinKernels route restrict/prolong through
    the 2D XLA MXU path on qualifying pairs (513^2 finest: Y=640 >= the
    256 gate) and stay on jnp below the gate.  The tier is DEFAULT OFF
    (measured loser vs the fused jnp transfers, see transfer.py
    _xla2d_min_y) — forced on here to pin the opt-in routing."""
    monkeypatch.setenv("PDE_MG_XLA2D_MIN_Y", "256")
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.models import Lyapunov2D
    from pde_multigrid_tpu.ops.pallas import dispatch as D

    prob = Lyapunov2D()
    h = Hierarchy.build(prob, 513, pad_last_to=128, pad_sublane_to=8)
    ker = D.PallasKernels(prob, h.geoms, jnp.float32, interpret=True)
    assert ker._xla_restrict[0] is not None
    assert ker._xla_prolong[0] is not None
    assert ker._xla_restrict[-2] is None  # tiny pairs stay jnp
    rng = np.random.default_rng(5)
    a = jnp.asarray(
        rng.standard_normal(h.geoms[0].padded_shape), jnp.float32
    )
    aux1 = h.levels[1].aux
    got = np.asarray(ker.restrict(0, a, aux1["m_int"], aux1["m_log"]))
    want = np.asarray(
        stencil.restrict_full_weighting(a, aux1["m_int"], aux1["m_log"])
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

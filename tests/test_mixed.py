"""Mixed-precision defect-correction smoothing (ops/pallas/defect.py).

The contract: relax_defect(v, f, nu) == relax_direct(v, f, nu) for any
linear stationary smoother — exactly in exact arithmetic (both equal
v* + M^nu (v - v*)), to bf16-of-the-error tolerance in mixed precision.
The iterate stays f32, so the solver reaches the same fixed point.
"""

import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.ops import stencil
from pde_multigrid_tpu.ops.pallas import defect as D
from pde_multigrid_tpu.ops.pallas import relax as R

RNG = np.random.default_rng(11)
F32 = jnp.dtype("float32")


def _wrap_level(n=129):
    """Wrap-storage 3D level in the defect-path shape family —
    (128, 128, 128) at n=129; wrap storage is lane-aligned only at
    2^k >= 128 — with random interior data."""
    prob = Poisson(3)
    h = Hierarchy.build(
        prob, n, pad_last_to=128, pad_sublane_to=8, wrap=True
    )
    lvl, geom = h.levels[0], h.geoms[0]
    m = np.asarray(lvl.aux["m_int"])
    v = jnp.asarray(
        (RNG.standard_normal(geom.padded_shape) * m).astype(np.float32)
    )
    f = jnp.asarray(
        (RNG.standard_normal(geom.padded_shape) * m).astype(np.float32)
    )
    return prob, lvl, geom, v, f


def _jnp_relax(prob, lvl, geom, v, f, n):
    return stencil.relax_rbgs(
        lambda vv, ff: prob.relax_update(vv, ff, geom, lvl.aux),
        v,
        f,
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        n,
    )


def test_defect_relax_f32_inner_is_identity():
    """With an f32 inner smoother the defect form is ALGEBRAICALLY the
    same iteration — only float re-association separates it from the
    direct sweeps (pins the residual/zero-init/fold wiring)."""
    prob, lvl, geom, v, f = _wrap_level()
    fn = D.plan_defect_relax(
        prob, geom, F32, interpret=True, inner_dtype=jnp.float32
    )
    assert fn is not None
    got = np.asarray(fn(v, f, 4))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 4))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_defect_relax_bf16_tracks_f32():
    """bf16 error/residual carry perturbs the leg by O(eps_bf16) of the
    CHANGE, not of the solution."""
    prob, lvl, geom, v, f = _wrap_level()
    fn = D.plan_defect_relax(prob, geom, F32, interpret=True)
    assert fn is not None
    got = np.asarray(fn(v, f, 6))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 6))
    scale = np.max(np.abs(want - np.asarray(v)))  # ~ the error moved
    assert np.max(np.abs(got - want)) < 0.02 * scale


def test_defect_planner_gates():
    prob = Poisson(3)
    # resident-tier level (no lane padding, tiny): must NOT engage
    h_small = Hierarchy.build(prob, 17, wrap=True)
    assert D.plan_defect_relax(prob, h_small.geoms[0], F32) is None
    # f64 outer: must not engage
    h = Hierarchy.build(
        prob, 65, pad_last_to=128, pad_sublane_to=8, wrap=True
    )
    assert (
        D.plan_defect_relax(prob, h.geoms[0], jnp.dtype("float64"))
        is None
    )


def test_resident_inner_selected_and_tracks_chunked(monkeypatch):
    """129^3-class levels take the ALL-sweeps-resident inner (the four
    halves fit VMEM) in both iterate dtypes (f32 preferred, bf16
    fallback); both match the chunked slab inner to the bf16
    quantization level and carry the lower engagement threshold."""
    prob, lvl, geom, v, f = _wrap_level()
    monkeypatch.setenv("PDE_MG_DEFECT_RESIDENT", "1")
    monkeypatch.setenv("PDE_MG_DEFECT_RESIDENT_F32", "1")
    fn_f32 = D.plan_defect_relax(prob, geom, F32, interpret=True)
    assert fn_f32 is not None
    assert fn_f32.min_sweeps == D.RESIDENT_MIN_SWEEPS
    monkeypatch.delenv("PDE_MG_DEFECT_RESIDENT_F32")
    fn_bf16 = D.plan_defect_relax(prob, geom, F32, interpret=True)
    assert fn_bf16.min_sweeps == D.RESIDENT_MIN_SWEEPS
    monkeypatch.setenv("PDE_MG_DEFECT_RESIDENT", "0")
    fn_chunk = D.plan_defect_relax(prob, geom, F32, interpret=True)
    assert fn_chunk.min_sweeps == D.MIXED_MIN_SWEEPS
    a32 = np.asarray(fn_f32(v, f, 5))
    a16 = np.asarray(fn_bf16(v, f, 5))
    b = np.asarray(fn_chunk(v, f, 5))
    # the chunked inner hands f32 red values to the black half-sweep
    # inside a chunk; the resident ones differ by iterate quantization
    # (f32: only the shared bf16 residual halves) — all paths agree to
    # O(eps_bf16) of the error moved
    scale = np.max(np.abs(b - np.asarray(v)))
    assert np.max(np.abs(a32 - b)) < 0.02 * scale
    assert np.max(np.abs(a16 - b)) < 0.02 * scale
    # and against the direct f32 sweeps (defect contract); the f32
    # iterate only sees the one-time bf16 residual quantization, so it
    # tracks the direct path tighter than the bf16 iterate does
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 5))
    err32 = np.max(np.abs(a32 - want))
    err16 = np.max(np.abs(a16 - want))
    assert err32 < 0.02 * scale
    assert err16 < 0.02 * scale
    # the f32 iterate only sees the one-time bf16 residual quantization,
    # so it should not track the direct path much WORSE than the bf16
    # iterate (loose factor: both are O(eps_bf16) noise, exact ordering
    # is rounding-dependent)
    assert err32 <= err16 * 1.5 + 1e-7 * scale


def test_mixed_solver_matches_f32_end_to_end():
    """Full FMG with precision='mixed' (forced pallas tier, interpreter
    mode on CPU): converges to the same discretization-accuracy solution
    as the f32 run, with the defect path actually engaged."""
    cy = CycleConfig("fmg", 1, 32, 32)
    s_mixed = MultigridSolver(
        Poisson(3),
        129,
        SolverConfig(cycle=cy, backend="pallas", precision="mixed"),
    )
    # the finest level must be on the bf16 defect path (guards against
    # the gate silently disengaging after planner changes)
    assert s_mixed.program.kernels._defect_fns[0] is not None
    assert cy.nu1 >= D.MIXED_MIN_SWEEPS
    s_f32 = MultigridSolver(
        Poisson(3), 129, SolverConfig(cycle=cy, backend="pallas")
    )
    rm = s_mixed.solve()
    rf = s_f32.solve()
    h = 1.0 / 128
    assert rm.error_linf < 50 * h * h
    # same discrete solution to well below discretization error
    assert abs(rm.error_linf - rf.error_linf) < 0.1 * rf.error_linf


def test_2d_blocked_bf16_inner_tracks_f32():
    """The 257^3-class inner tier (2D-blocked split slab, bf16 storage +
    f32 compute) follows the dense f32 sweeps to bf16-store tolerance."""
    prob, lvl, geom, v, f = _wrap_level()
    B16 = jnp.bfloat16
    fn = R.make_split_slab_relax_2d(
        prob,
        geom,
        B16,
        8,
        16,
        sweeps_per_call=1,
        interpret=True,
        raw=True,
        compute_dtype=jnp.float32,
    )
    qb = R._split_qmask(*[geom.padded_shape[i] for i in (0, 2)])
    r, b = (a.astype(B16) for a in R.split_colors(v, qb))
    fr, fb = (a.astype(B16) for a in R.split_colors(f, qb))
    ro, bo = fn(r, b, fr, fb, 2)
    got = np.asarray(
        R.merge_colors(
            ro.astype(jnp.float32), bo.astype(jnp.float32), qb
        )
    )
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 2))
    # direct smoothing of bf16-stored v: error ~ eps_bf16 * |v| per store
    assert np.max(np.abs(got - want)) < 0.02 * np.max(np.abs(want))


def test_defect_planner_covers_257_class():
    """plan_defect_relax must find the 2D-blocked inner once whole
    half-planes bust VMEM (the 257^3 tier) when DEFECT_2D is on, and
    stay f32 when it is off (measured slower, see defect.DEFECT_2D) —
    planning only, no compile."""
    prob = Poisson(3)
    h = Hierarchy.build(
        prob, 257, pad_last_to=128, pad_sublane_to=8, wrap=True
    )
    assert h.geoms[0].padded_shape == (256, 256, 256)
    assert D.plan_defect_relax(prob, h.geoms[0], F32, interpret=True) is None
    D.DEFECT_2D = True
    try:
        fn = D.plan_defect_relax(prob, h.geoms[0], F32, interpret=True)
    finally:
        D.DEFECT_2D = False
    assert fn is not None


def test_split_slab_v_zero_first_chunk():
    """relax_raw(v_zero=True) (iterate halves statically zero, no HBM
    stream for them on the first chunk) == relax_raw from explicit zero
    halves, for nsweeps below and above T."""
    prob, lvl, geom, v, f = _wrap_level(33)
    X, Y, Z = geom.padded_shape
    fn = R.make_split_slab_relax(
        prob, geom, F32, 4, sweeps_per_call=2, interpret=True, raw=True
    )
    assert fn.supports_v_zero
    qb = R._split_qmask(X, Z)
    fr, fb = R.split_colors(f, qb)
    z = jnp.zeros((X, Y // 2, Z), F32)
    for ns in (1, 2, 5):
        got = fn(None, None, fr, fb, ns, v_zero=True)
        want = fn(z, z, fr, fb, ns)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7,
                err_msg=f"ns={ns}",
            )

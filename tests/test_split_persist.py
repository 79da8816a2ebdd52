"""Persistent color-split 2D tier (VERDICT r4 #1, ops/split2d.py +
dispatch.PallasKernels split plumbing): split-layout residual+restrict
and prolong+blend match the dense jnp tier, and a full FMG solve with
the persistent tier matches the jnp solver."""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)
from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.ops import split2d, stencil
from pde_multigrid_tpu.ops.pallas import relax as R

RNG = np.random.default_rng(7)
F32 = jnp.float32


def _hier(n=65):
    return Hierarchy.build(
        Lyapunov2D(), n, pad_last_to=128, pad_sublane_to=8
    )


def _rand(shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


def test_residual_restrict_from_halves_matches_dense():
    prob = Lyapunov2D()
    h = _hier()
    g0, g1 = h.geoms[0], h.geoms[1]
    aux0, aux1 = h.levels[0].aux, h.levels[1].aux
    v = _rand(g0.padded_shape)
    f = _rand(g0.padded_shape)
    Y2p = split2d.half_width(g0)
    split_pad, merge = R.make_color_converters_2d(
        *g0.padded_shape, Y2p, F32
    )
    r_h, b_h = split_pad(v)
    fr, fb = split_pad(f)
    # dense reference: residual then full-weighting restriction
    r_dense = stencil.residual(
        lambda vv: prob.apply_operator(vv, g0, aux0), v, f, aux0["m_int"]
    )
    want = np.asarray(
        stencil.restrict_full_weighting(
            r_dense, aux1["m_int"], aux1["m_log"]
        )
    )
    rr_h, rb_h = split2d.residual_halves(prob, g0, r_h, b_h, fr, fb, F32)
    # the residual halves themselves must merge to the dense residual
    np.testing.assert_allclose(
        np.asarray(merge(rr_h, rb_h)),
        np.asarray(r_dense),
        rtol=1e-4,
        atol=1e-3,  # residual magnitudes ~1e2 (K/h terms); f32
        # cancellation in (f - Lv) puts reassociation noise at ~1e-5 abs
    )
    got = np.asarray(
        split2d.restrict_residual_from_halves(
            g0, g1, rr_h, rb_h, aux1["m_int"], aux1["m_log"]
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    # f == 0 fast path (finest Lyapunov legs)
    zero = jnp.zeros_like(v)
    r0 = stencil.residual(
        lambda vv: prob.apply_operator(vv, g0, aux0),
        v,
        zero,
        aux0["m_int"],
    )
    want0 = np.asarray(
        stencil.restrict_full_weighting(r0, aux1["m_int"], aux1["m_log"])
    )
    rr0, rb0 = split2d.residual_halves(
        prob, g0, r_h, b_h, None, None, F32
    )
    got0 = np.asarray(
        split2d.restrict_residual_from_halves(
            g0, g1, rr0, rb0, aux1["m_int"], aux1["m_log"]
        )
    )
    np.testing.assert_allclose(got0, want0, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("mode", ["add", "replace"])
def test_prolong_blend_halves_matches_dense(mode):
    h = _hier()
    g0, g1 = h.geoms[0], h.geoms[1]
    aux0 = h.levels[0].aux
    base = _rand(g0.padded_shape)
    c = _rand(g1.padded_shape)
    Y2p = split2d.half_width(g0)
    split_pad, merge = R.make_color_converters_2d(
        *g0.padded_shape, Y2p, F32
    )
    r_h, b_h = split_pad(base)
    up = stencil.prolong_linear(c, g0.padded_shape)
    m = aux0["m_int"]
    want = base + m * up if mode == "add" else base + m * (up - base)
    r2, b2 = split2d.prolong_blend_halves(
        g1, g0, c, r_h, b_h, mode, F32
    )
    np.testing.assert_allclose(
        np.asarray(merge(r2, b2)) * np.asarray(m),
        np.asarray(want) * np.asarray(m),
        rtol=1e-5,
        atol=1e-5,
    )
    # off-interior points must be untouched (blend is interior-only)
    keep = 1.0 - np.asarray(m)
    np.testing.assert_array_equal(
        np.asarray(merge(r2, b2)) * keep, np.asarray(base) * keep
    )


@pytest.mark.parametrize("prob_cls", ["lyapunov", "poisson2d"])
def test_persistent_split_fmg_matches_jnp(monkeypatch, prob_cls):
    """Full FMG with the persistent-split tier engaged on every level
    the ladder accepts (MIN_Y2 forced down so 65^2 qualifies) == the
    jnp solver to transfer-reassociation tolerance.  poisson2d runs
    with storage='padded' (its zero boundary otherwise takes wrap
    storage, which the 2D split tiers don't cover)."""
    from pde_multigrid_tpu import Poisson

    monkeypatch.setattr(R, "SPLIT2D_MIN_Y2", 16)

    def mk(backend):
        return SolverConfig(
            cycle=CycleConfig("fmg", 1, 3, 3),
            backend=backend,
            pad_last_to=128,
            pad_sublane_to=8,
            max_cycles=2,
            tol=0.0,
            storage="padded",
        )

    prob = Lyapunov2D() if prob_cls == "lyapunov" else Poisson(2)
    sp = MultigridSolver(prob, 65, mk("pallas"))
    ker = sp.program.kernels
    assert ker._split_raw[0] is not None, "persistent tier not engaged"
    assert ker._split_ops, "split_operator2d hook not detected"
    rp = sp.solve_to_tolerance()
    rj = MultigridSolver(prob, 65, mk("jnp")).solve_to_tolerance()
    assert not rp.diverged and not rj.diverged
    np.testing.assert_allclose(
        np.asarray(rp.v), np.asarray(rj.v), rtol=3e-5, atol=3e-5
    )
    np.testing.assert_allclose(
        rp.error_linf, rj.error_linf, rtol=2e-3, atol=1e-5
    )

"""Pallas kernel tier vs jnp reference tier (interpreter mode on CPU).

The fused kernels must be algorithm-identical to ops.stencil.relax_rbgs
(same two-color sweep ordering); tolerances only allow for
reciprocal-vs-divide rounding."""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Lyapunov2D, Ode1D, Poisson
from pde_multigrid_tpu.ops import stencil
from pde_multigrid_tpu.ops.pallas import relax as R
from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    SolverConfig,
)

RNG = np.random.default_rng(7)
F32 = jnp.dtype("float32")


def _rand_level(prob, n, **build_kw):
    h = Hierarchy.build(prob, n, **build_kw)
    lvl, geom = h.levels[0], h.geoms[0]
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    f = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    return lvl, geom, v, f


def _jnp_relax(prob, lvl, geom, v, f, n):
    return stencil.relax_rbgs(
        lambda vv, ff: prob.relax_update(vv, ff, geom, lvl.aux),
        v,
        f,
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        n,
    )


@pytest.mark.parametrize(
    "prob,n",
    [
        (Poisson(1), 33),
        (Poisson(2), 17),
        (Poisson(3), 9),
        (Ode1D(), 33),
        (Lyapunov2D(), 17),
    ],
    ids=lambda p: getattr(p, "name", str(p)),
)
def test_resident_kernel_matches_jnp(prob, n):
    lvl, geom, v, f = _rand_level(prob, n)
    fn = R.make_resident_relax(prob, geom, F32, interpret=True)
    got = np.asarray(fn(v, f, 3))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("B,T", [(4, 1), (8, 1), (4, 2), (8, 2)])
def test_slab_kernel_matches_jnp_3d(B, T):
    prob = Poisson(3)
    lvl, geom, v, f = _rand_level(
        prob, 17, pad_last_to=128, pad_sublane_to=8
    )
    fn = R.make_slab_relax(prob, geom, F32, B, T, interpret=True)
    got = np.asarray(fn(v, f, 5))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_slab_kernel_matches_jnp_2d():
    prob = Poisson(2)
    lvl, geom, v, f = _rand_level(
        prob, 65, pad_last_to=128, pad_sublane_to=8
    )
    fn = R.make_slab_relax(prob, geom, F32, 16, 2, interpret=True)
    got = np.asarray(fn(v, f, 3))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_full_solve_pallas_backend_matches_jnp():
    """End-to-end FMG with backend='pallas' (forced, interpreter mode on
    CPU) must match the jnp backend to float32 tolerance."""
    cfg_p = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2), backend="pallas"
    )
    cfg_j = SolverConfig(cycle=CycleConfig("fmg", 1, 2, 2), backend="jnp")
    rp = MultigridSolver(Poisson(3), 17, cfg_p).solve()
    rj = MultigridSolver(Poisson(3), 17, cfg_j).solve()
    assert abs(rp.error_linf - rj.error_linf) < 1e-6
    assert abs(rp.residual_l2 - rj.residual_l2) < 1e-5
    from pde_multigrid_tpu.ops.pallas.dispatch import PallasKernels

    assert isinstance(
        MultigridSolver(Poisson(3), 17, cfg_p).program.kernels,
        PallasKernels,
    )


def test_plan_relax_covers_all_levels_3d():
    """On tile-aligned hierarchies every 3D level gets a fused kernel."""
    prob = Poisson(3)
    h = Hierarchy.build(prob, 33, pad_last_to=128, pad_sublane_to=8)
    for g in h.geoms:
        assert R.plan_relax(prob, g, F32, interpret=True) is not None

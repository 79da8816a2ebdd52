"""Wrap storage (zero-waste 2^k arrays for homogeneous-Dirichlet problems):
the shared zero boundary plane at stored index 0 serves both domain ends
via roll wraparound.  Must match padded storage everywhere."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Ode1D,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.ops import stencil
from pde_multigrid_tpu.ops.pallas import relax as R
from pde_multigrid_tpu.parallel import mesh as pmesh


def cfgs(storage, cycles=2, backend="jnp"):
    return SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2),
        storage=storage,
        max_cycles=cycles,
        tol=0.0,
        backend=backend,
    )


@pytest.mark.parametrize(
    "prob,n",
    [(Poisson(1), 65), (Poisson(2), 65), (Poisson(3), 33)],
    ids=["p1d", "p2d", "p3d"],
)
def test_wrap_matches_padded(prob, n):
    sw = MultigridSolver(prob, n, cfgs("wrap"))
    sp = MultigridSolver(prob, n, cfgs("padded"))
    assert sw.geoms[0].wrap and not sp.geoms[0].wrap
    assert sw.geoms[0].padded_shape == (n - 1,) * prob.ndim
    rw, rp = sw.solve_to_tolerance(), sp.solve_to_tolerance()
    vw, vp = np.asarray(rw.v), np.asarray(rp.v)
    np.testing.assert_allclose(
        vw, vp[tuple(slice(0, d) for d in vw.shape)], rtol=2e-5, atol=2e-6
    )
    assert abs(rw.error_linf - rp.error_linf) < 1e-5


def test_wrap_rejected_for_nonzero_boundary():
    s = MultigridSolver(Ode1D(), 65, SolverConfig(backend="jnp"))
    assert not s.geoms[0].wrap  # auto falls back to padded
    with pytest.raises(ValueError):
        MultigridSolver(
            Ode1D(), 65, SolverConfig(storage="wrap", backend="jnp")
        )


def test_wrap_pallas_kernels_exact():
    rng = np.random.default_rng(2)
    prob = Poisson(3)
    h = Hierarchy.build(prob, 17, wrap=True)
    lvl, geom = h.levels[0], h.geoms[0]
    v0 = jnp.asarray(
        rng.standard_normal(geom.padded_shape).astype(np.float32)
    )
    for ax in range(3):  # wrap invariant: stored plane 0 is the boundary
        v0 = v0.at[(slice(None),) * ax + (0,)].set(0.0)
    f0 = jnp.asarray(
        rng.standard_normal(geom.padded_shape).astype(np.float32)
    )
    want = stencil.relax_rbgs(
        lambda v, f: prob.relax_update(v, f, geom, lvl.aux),
        v0,
        f0,
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        5,
    )
    F32 = jnp.dtype("float32")
    got_r = R.make_resident_relax(prob, geom, F32, interpret=True)(v0, f0, 5)
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want))
    got_s = R.make_slab_relax(prob, geom, F32, 4, 2, interpret=True)(
        v0, f0, 5
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_wrap_sharded_matches_single():
    cfg = cfgs("wrap")
    single = MultigridSolver(Poisson(3), 33, cfg).solve_to_tolerance()
    ms = MultigridSolver(Poisson(3), 33, cfg, mesh=pmesh.make_mesh(8))
    assert ms.geoms[0].wrap and ms.geoms[0].padded_shape[0] % 8 == 0
    sharded = ms.solve_to_tolerance()
    np.testing.assert_array_equal(
        np.asarray(single.v), np.asarray(sharded.v)
    )

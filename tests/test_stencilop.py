"""Resident Pallas kernel for implicit-stencil (Galerkin/varcoef)
operators: bitwise parity vs the jnp tier + end-to-end convergence.

The variable-coefficient problem is the one family whose relax reads a
per-point coefficient FIELD (aux['stencil_coeffs']) instead of closed-
form coefficients, so it exercises the operand-passing path the other
kernel families never touch (ops/pallas/stencilop.py)."""

import numpy as np
import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
    VariableCoefficientPoisson,
)

RNG = np.random.default_rng(23)


def _solver(prob, n, backend):
    cfg = SolverConfig(
        cycle=CycleConfig("v", 0, 2, 2, coarse_operator="galerkin"),
        backend=backend,
    )
    return MultigridSolver(prob, n, cfg)


def test_galerkin_pallas_relax_bitwise_vs_jnp():
    for prob, n in [
        (VariableCoefficientPoisson(2), 33),
        (Poisson(3), 17),
    ]:
        s = _solver(prob, n, "pallas")
        ker = s.program.kernels
        engaged = [
            l for l, fn in enumerate(ker._relax_fns) if fn is not None
        ]
        assert engaged, f"no level engaged the stencil kernel ({prob.name})"
        levels = s.fresh_levels()
        for l in engaged:
            lvl = levels[l]
            v = jnp.asarray(
                RNG.standard_normal(lvl.v.shape), jnp.float32
            ) * lvl.aux["m_log"]
            f = jnp.asarray(
                RNG.standard_normal(lvl.f.shape), jnp.float32
            )
            # jnp-tier reference: same class with kernels disabled
            from pde_multigrid_tpu.ops.galerkin import GalerkinKernels

            ref = GalerkinKernels(prob, s.geoms, ker.offsets, pallas="off")
            for nsweeps in (1, 3):
                got = ker.relax(l, v, f, lvl.aux, nsweeps)
                want = ref.relax(l, v, f, lvl.aux, nsweeps)
                # ulp-level only: XLA contracts a*b-c to FMA differently
                # inside the pallas interpreter than in the eager jnp
                # tier (measured max |diff| = 1 ulp, rel ~1e-4 near 0)
                np.testing.assert_allclose(
                    np.asarray(got),
                    np.asarray(want),
                    rtol=2e-4,
                    atol=5e-6,
                    err_msg=f"{prob.name} level {l} nsweeps={nsweeps}",
                )


def test_galerkin_pallas_vcycle_converges_varcoef2d():
    s = _solver(VariableCoefficientPoisson(2), 33, "pallas")
    assert any(fn is not None for fn in s.program.kernels._relax_fns)
    levels = s.fresh_levels()
    import jax

    step = jax.jit(s.program.solve_step)
    norms = []
    for _ in range(3):
        levels = step(levels)
        l2, _ = s.program.residual_norms(levels)
        norms.append(float(l2))
    assert norms[-1] < 1e-2 * norms[0], norms


def test_galerkin_slab_kernel_matches_jnp(monkeypatch):
    """The streaming slab stencil-operator kernel (beyond-resident 2D
    levels, ops/pallas/stencilop.py::make_stencil_relax_slab_2d) must
    match the jnp tier like the resident kernel does — VERDICT r3 #3.
    Forced to engage by zeroing the resident budget; in production it
    serves 513^2-and-up Galerkin levels the jnp tier previously owned
    at ~2(K+2) HBM round trips per sweep."""
    from pde_multigrid_tpu.ops.galerkin import GalerkinKernels
    from pde_multigrid_tpu.ops.pallas import stencilop

    monkeypatch.setattr(stencilop, "RESIDENT_VMEM_BUDGET", 0)
    prob = VariableCoefficientPoisson(2)
    cfg = SolverConfig(
        cycle=CycleConfig("v", 0, 2, 2, coarse_operator="galerkin"),
        backend="pallas",
    )
    # wrap (2^k) storage: the slab kernel needs a 128-aligned lane
    # extent, so only the n >= 257 levels (Y >= 128) engage it
    s = MultigridSolver(prob, 257, cfg)
    ker = s.program.kernels
    engaged = [
        l for l, fn in enumerate(ker._relax_fns) if fn is not None
    ]
    assert engaged, "no level engaged the slab stencil kernel"
    for l in engaged:
        assert "slab" in ker._relax_fns[l].__qualname__
    ref = GalerkinKernels(prob, s.geoms, ker.offsets, pallas="off")
    levels = s.fresh_levels()
    for l in engaged:
        lvl = levels[l]
        v = jnp.asarray(
            RNG.standard_normal(lvl.v.shape), jnp.float32
        ) * lvl.aux["m_log"]
        f = jnp.asarray(RNG.standard_normal(lvl.f.shape), jnp.float32)
        # T=4 sweeps/chunk at this size: cover full chunks + remainder
        for nsweeps in (1, 4, 9):
            got = ker.relax(l, v, f, lvl.aux, nsweeps)
            want = ref.relax(l, v, f, lvl.aux, nsweeps)
            np.testing.assert_allclose(
                np.asarray(got),
                np.asarray(want),
                rtol=2e-4,
                atol=5e-6,
                err_msg=f"level {l} nsweeps={nsweeps}",
            )


def test_galerkin_on_mesh_raises():
    """galerkin x mesh must fail loudly, not silently drop the mesh
    (the sharded tier has no stencil-coefficient relax path)."""
    import pytest

    from pde_multigrid_tpu.parallel import mesh as pmesh

    m = pmesh.make_mesh(1)
    with pytest.raises(ValueError, match="galerkin"):
        MultigridSolver(
            VariableCoefficientPoisson(2),
            17,
            SolverConfig(
                cycle=CycleConfig(
                    "v", 0, 2, 2, coarse_operator="galerkin"
                )
            ),
            mesh=m,
        )

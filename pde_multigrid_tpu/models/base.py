"""Problem protocol: what the multigrid core needs from a PDE/ODE problem.

A problem supplies, per level:
  * precomputed coefficient fields (in `Level.aux`) — e.g. the Lyapunov
    advection fields K1, K2 or the 1D ODE's e^x + 1,
  * `relax_update(v, f, geom, aux)` — the pointwise local solve: the value
    the red-black Gauss-Seidel sweep writes at a point, computed for *all*
    points simultaneously (the caller masks to one color's interior points),
  * `apply_operator(v, geom, aux)` — L v, the discrete operator, used for
    residuals r = f - L v,
  * analytic oracle + RHS + Dirichlet boundary data for init/verification
    (the reference's Grid*::InitV/InitF and Print* verifiers, SURVEY.md §3.3-3.4).

Both hot functions are pure elementwise/shift math on whole arrays, which is
exactly what XLA fuses into a handful of HBM passes on TPU; the Pallas tier
(ops/pallas) overrides them per problem with fused in-VMEM kernels.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.grid import Level, LevelGeometry, base_aux

Array = jax.Array


@runtime_checkable
class Problem(Protocol):
    ndim: int
    domain: tuple[tuple[float, float], ...]
    name: str

    def exact_solution(self, coords: tuple[Array, ...]) -> Array: ...

    def rhs(self, coords: tuple[Array, ...]) -> Array: ...

    def make_aux(self, geom: LevelGeometry, dtype) -> dict[str, Array]: ...

    def relax_update(
        self, v: Array, f: Array, geom: LevelGeometry, aux: dict[str, Array]
    ) -> Array: ...

    def apply_operator(
        self, v: Array, geom: LevelGeometry, aux: dict[str, Array]
    ) -> Array: ...

    def init_level(self, geom: LevelGeometry, dtype) -> Level: ...


class ProblemBase:
    """Shared init logic: v = boundary Dirichlet data (analytic solution on
    the boundary, zero interior), f = analytic RHS everywhere.

    Mirrors reference Grid{1,2,3}D InitV/InitF (e.g. Grid2D.cpp:50-80) but
    fixes defect §2.7.7 (uninitialized interiors): we zero-fill the interior
    explicitly so every schedule (not just FMG) starts well-defined.
    """

    # True when rhs() is identically zero (so the RHS cascaded down by FMG
    # is zero on EVERY level): relax kernels that advertise
    # `supports_f_zero` then drop the f stream on RHS-carrying legs
    # (cycles.CycleProgram threads the flag; see relax.py f_zero paths)
    rhs_is_zero = False

    def boundary_values(self, coords: tuple[Array, ...]) -> Array:
        return self.exact_solution(coords)

    def init_level(self, geom: LevelGeometry, dtype=jnp.float32) -> Level:
        aux = dict(base_aux(geom, dtype))
        aux.update(self.make_aux(geom, dtype))
        coords = geom.coords(dtype)
        bv = self.boundary_values(coords).astype(dtype)
        m_int, m_log = aux["m_int"], aux["m_log"]
        # Dirichlet data on the logical boundary, zero interior and padding
        v = bv * (m_log - m_int)
        if not geom.wrap:
            # solve-time constant: FMG re-imposes the boundary ring every
            # step (cycles.fmg); hoisting it here keeps the per-step
            # program free of analytic-solution evaluations.  A distinct
            # buffer from v — they would otherwise alias, and solvers
            # donate the level pytree (double-donation error)
            aux["bv_ring"] = v.copy()
        f = self.rhs(coords).astype(dtype) * m_log
        return Level(v=v, f=f, aux=aux)

    def shift(self, a: Array, axis: int, offset: int) -> Array:
        """a shifted so result[i] = a[i + offset] along `axis`.

        Wraparound values only ever land on boundary points, which every
        consumer masks out (interior-only updates / zero boundary residual).
        """
        return jnp.roll(a, -offset, axis=axis)

    # -- Pallas kernel tier hooks (ops/pallas) -----------------------------
    #
    # Inside a fused relaxation kernel, coefficient fields are re-derived
    # from in-register coordinates (iota) instead of streamed from HBM, and
    # divisions are hoisted out of the sweep loop as precomputed
    # reciprocals.  `kernel_precompute` runs once per kernel invocation;
    # `kernel_update` runs per sweep per color and must be pure VPU math.

    def kernel_precompute(
        self, coords: tuple[Array, ...], geom: LevelGeometry, dtype
    ) -> dict[str, Array]:
        return {}

    def kernel_update(
        self, v: Array, f: Array, pre: dict[str, Array], geom: LevelGeometry
    ) -> Array:
        raise NotImplementedError

"""1D first-order linear ODE (the reference's misnamed "Poisson1D").

    u'(x) - u(x)/(e^x + 1) = e^x,   x in [x_a, x_b],
    Dirichlet at both ends from the exact solution
    u(x) = (e^x + x - 3) / (1 + e^-x).

Discretization (thesis eq. 3.1.1-3.1.3; reference Grid1D.cpp:30-43,
MultiGrid1D.cpp:79-118): forward difference u' ~ (v[j+1] - v[j]) / h.
Local solve for the center point:

    v[j] = (v[j+1]*(e^x+1) - f[j]*h*(e^x+1)) / (e^x + 1 + h).

Residual: r = f - [(v[j+1]-v[j])/h - v[j]/(e^x+1)]. NOTE: the reference's
CalculateResidual (MultiGrid1D.cpp:210, MultiGrid1D.cu:305) has a sign typo
(`- v/(e^x+1)` instead of `+`), inconsistent with its own relax step; we
implement the residual of the operator the relax step actually solves
(SURVEY.md §2.7.4 — fix, don't port).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.models.base import ProblemBase

Array = jax.Array


class Ode1D(ProblemBase):
    ndim = 1
    name = "ode1d"

    def __init__(self, domain: tuple[tuple[float, float], ...] = ((0.0, 1.0),)):
        self.domain = tuple(tuple(d) for d in domain)

    def exact_solution(self, coords: tuple[Array, ...]) -> Array:
        (x,) = coords
        return (jnp.exp(x) + x - 3.0) / (1.0 + jnp.exp(-x))

    def rhs(self, coords: tuple[Array, ...]) -> Array:
        (x,) = coords
        return jnp.exp(x)

    def make_aux(self, geom: LevelGeometry, dtype=jnp.float32):
        (x,) = geom.coords(dtype)
        epx = jnp.exp(x) + 1.0  # e^x + 1, the variable coefficient field
        return {"epx": epx.astype(dtype)}

    def relax_update(self, v, f, geom: LevelGeometry, aux) -> Array:
        h = jnp.asarray(geom.spacing[0], v.dtype)
        epx = aux["epx"]
        east = self.shift(v, 0, +1)  # v[j+1]
        return (east * epx - f * h * epx) / (epx + h)

    def apply_operator(self, v, geom: LevelGeometry, aux) -> Array:
        h = jnp.asarray(geom.spacing[0], v.dtype)
        epx = aux["epx"]
        east = self.shift(v, 0, +1)
        return (east - v) / h - v / epx

    # -- implicit-stencil operator form (ops/galerkin.py) -------------------

    def stencil_operator(self, geom: LevelGeometry, aux, dtype=jnp.float32):
        """The 2-point forward-difference stencil (center, E=+1)."""
        from pde_multigrid_tpu.ops.galerkin import StencilOperator

        h = geom.spacing[0]
        epx = aux["epx"]
        center = -1.0 / h - 1.0 / epx
        east = jnp.full_like(epx, 1.0 / h)
        coeffs = jnp.stack([center, east], axis=-1).astype(dtype)
        return StencilOperator(offsets=((0,), (1,)), coeffs=coeffs)

    # -- exact O(log N) solve -----------------------------------------------

    def exact_solve(self, v, f, geom: LevelGeometry, aux):
        """Solve the discrete system exactly in O(log N) depth.

        The relaxation fixed point is the backward affine recurrence
        v[j] = A_j v[j+1] + B_j (the same local solve the reference runs
        nu=1000 sweeps of, Poisson1DSolver.cpp:15-18).  On TPU the whole
        recurrence collapses to one `lax.associative_scan` over composed
        affine maps — the idiomatic replacement for sequential
        Gauss-Seidel in 1D, also reaching machine-precision residuals in
        one application.  Boundary/padded entries become constant maps, so
        Dirichlet data anchors the scan with no special cases.
        """
        import numpy as np

        h = geom.spacing[0]
        n = geom.shape[0]
        dtype = v.dtype
        npdt = np.dtype(dtype)
        # numpy constants: embed as literals (not lifted closure inputs)
        i = np.arange(v.shape[0])
        lo, hi = geom.domain[0]
        x = np.clip(
            np.asarray(geom.origin[0], npdt) + i.astype(npdt) * npdt.type(h),
            min(lo, hi),
            max(lo, hi),
        )
        epx = np.exp(x) + 1.0
        interior = (i >= 1) & (i <= n - 2)
        a = jnp.asarray(
            np.where(interior, epx / (epx + h), 0.0).astype(npdt)
        )
        bf = jnp.asarray((-h * epx / (epx + h)).astype(npdt))
        m_int = jnp.asarray(interior.astype(npdt))
        b = jnp.where(m_int > 0, f * bf, v)  # const map -> boundary anchor

        def compose(left, right):
            # (right-to-left application): result = left applied after...
            # we need suffix composition f_j(f_{j+1}(...)), and
            # associative_scan(reverse=True) reduces with the LATER element
            # as the left operand, so compose must apply the left operand
            # (later index) FIRST: (a2,b2)o(a1,b1) with left=(a1,b1).
            a1, b1 = left
            a2, b2 = right
            return a2 * a1, a2 * b1 + b2

        _, v_new = jax.lax.associative_scan(
            compose, (a, b), reverse=True
        )
        return v_new

    # -- Pallas kernel tier -------------------------------------------------

    def kernel_precompute(self, coords, geom: LevelGeometry, dtype):
        (x,) = coords
        h = geom.spacing[0]
        epx = jnp.exp(x) + 1.0
        return {
            "a_e": epx / (epx + h),  # coefficient of the east neighbor
            "a_f": -(h * epx) / (epx + h),  # coefficient of f
        }

    def kernel_update(self, v, f, pre, geom: LevelGeometry):
        east = self.shift(v, v.ndim - 1, +1)
        return east * pre["a_e"] + f * pre["a_f"]

    def split_update1d(self, east, f, pre, geom: LevelGeometry):
        """Local solve on 1D color-split storage (relax.
        make_split_resident_relax_1d): `east` is the opposite color's
        east-neighbor gather, `pre` this color's coefficient fields.
        Same term order as kernel_update."""
        return east * pre["a_e"] + f * pre["a_f"]

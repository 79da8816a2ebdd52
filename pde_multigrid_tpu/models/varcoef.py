"""Variable-coefficient diffusion: div( a(x) grad u ) = f, Dirichlet BCs.

An extension family beyond the reference (which is constant-coefficient
only) and the reason the Galerkin operator layer exists: rediscretizing
coarse levels requires restricting the coefficient field with ad-hoc
rules, while Galerkin RAP coarsening (ops/galerkin.py) is exact by
construction — this problem's coarse operators are ALWAYS Galerkin.

Discretization: conservative flux form with arithmetic-mean face
coefficients,

  L v = sum_ax [ a_{+}(v_+ - v) - a_{-}(v - v_-) ] / h_ax^2 ,
  a_{±} = (a(x) + a(x ± h e_ax)) / 2.

Verification uses a *discretely manufactured* solution: pick u*, set
f := L_h u* (the discrete operator applied to the oracle), so the exact
discrete solution IS u* and solver error measures pure algebraic
convergence with no discretization-error floor.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.grid import Level, LevelGeometry, base_aux
from pde_multigrid_tpu.models.base import ProblemBase

Array = jax.Array


class VariableCoefficientPoisson(ProblemBase):
    def __init__(
        self,
        ndim: int,
        coefficient: Callable[..., Array] | None = None,
        oracle: Callable[..., Array] | None = None,
        domain=None,
    ):
        self.ndim = int(ndim)
        self.name = f"varcoef{self.ndim}d"
        self.domain = (
            tuple(tuple(d) for d in domain)
            if domain is not None
            else ((0.0, 1.0),) * self.ndim
        )
        import math

        self.coefficient = coefficient or (
            lambda *xs: 1.0 + 0.5 * jnp.sin(math.pi * xs[0])
        )
        self.oracle = oracle or (
            lambda *xs: jnp.prod(
                jnp.stack([x * (1.0 - x) for x in xs]), axis=0
            )
        )

    def exact_solution(self, coords) -> Array:
        return self.oracle(*coords)

    def rhs(self, coords) -> Array:  # unused: init_level manufactures f
        return jnp.zeros_like(coords[0])

    def make_aux(self, geom: LevelGeometry, dtype=jnp.float32):
        op = self._build_operator(geom, dtype)
        return {"stencil_coeffs": op.coeffs}

    def _build_operator(self, geom: LevelGeometry, dtype=jnp.float32):
        from pde_multigrid_tpu.ops.galerkin import StencilOperator

        coords = geom.coords(dtype)
        a = self.coefficient(*coords).astype(dtype)
        offsets = [(0,) * self.ndim]
        coeffs = [jnp.zeros_like(a)]
        center = jnp.zeros_like(a)
        for ax in range(self.ndim):
            w = 1.0 / (geom.spacing[ax] ** 2)
            a_plus = 0.5 * (a + self.shift(a, ax, +1))
            a_minus = 0.5 * (a + self.shift(a, ax, -1))
            for s, af in ((-1, a_minus), (+1, a_plus)):
                off = [0] * self.ndim
                off[ax] = s
                offsets.append(tuple(off))
                coeffs.append(af * w)
            center = center - (a_plus + a_minus) * w
        coeffs[0] = center
        return StencilOperator(
            offsets=tuple(offsets), coeffs=jnp.stack(coeffs, axis=-1)
        )

    def _op(self, aux):
        from pde_multigrid_tpu.ops.galerkin import StencilOperator

        offsets = [(0,) * self.ndim]
        for ax in range(self.ndim):
            for s in (-1, +1):
                off = [0] * self.ndim
                off[ax] = s
                offsets.append(tuple(off))
        return StencilOperator(
            offsets=tuple(offsets), coeffs=aux["stencil_coeffs"]
        )

    def stencil_operator(self, geom: LevelGeometry, aux, dtype=jnp.float32):
        return self._op(aux)

    def relax_update(self, v, f, geom: LevelGeometry, aux) -> Array:
        return self._op(aux).gs_update(v, f)

    def apply_operator(self, v, geom: LevelGeometry, aux) -> Array:
        return self._op(aux).apply(v)

    def init_level(self, geom: LevelGeometry, dtype=jnp.float32) -> Level:
        aux = dict(base_aux(geom, dtype))
        aux.update(self.make_aux(geom, dtype))
        coords = geom.coords(dtype)
        u = self.exact_solution(coords).astype(dtype)
        m_int, m_log = aux["m_int"], aux["m_log"]
        v = u * (m_log - m_int)
        # discretely manufactured RHS: f = L_h u* on the interior
        f = self._op(aux).apply(u * m_log) * m_int
        return Level(v=v, f=f, aux=aux)

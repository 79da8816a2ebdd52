"""2D Lyapunov PDE.

    (dV/dx)(a11 x + a12 y) + (dV/dy)(a21 x + a22 y) = -alpha V

derived from Vdot = grad(V) . f(x) = -alpha V for the linear system
xdot = A x (thesis eq. 3.2.22-3.2.23).  With the reference's default
A = [[-1, -2], [0, -3]] (Hurwitz) and alpha = 2 the exact solution is the
quadratic Lyapunov form V = 2x^2 - 4xy + 2y^2 (reference LyapunovSolver.cpp:20-28,
Grid2D.cpp:61).  RHS f = 0 on the finest grid; Dirichlet boundary = exact V.

Discretization (thesis eq. 3.2.25-3.2.27; reference MultiGrid2D.cpp:199-273):
forward differences on both axes — a 3-point one-sided stencil (center,
E = +x neighbor, S = +y neighbor).  With K1 = a11 x + a12 y, K2 = a21 x + a22 y:

    operator:  L v = K1 (E - C)/h_x + K2 (S - C)/h_y + alpha C
    residual:  r = f - L v                       (MultiGrid2D.cpp:367-408)
    relax:     C = (h_y K1 E + h_x K2 S - f h_x h_y)
                   / (K1 h_y + K2 h_x - alpha h_x h_y)   (MultiGrid2D.cpp:233-241)

The CPU reference's relax and residual are mutually consistent; the CUDA
reference drops the f term in relax (SURVEY.md §2.7.2) — we implement the
correct CPU semantics.  Note the sign convention: the PDE is L v = 0 with
the alpha-term folded in, so f=0 at the finest level and f=restricted
residual on coarse levels, exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.models.base import ProblemBase

Array = jax.Array


class Lyapunov2D(ProblemBase):
    ndim = 2
    name = "lyapunov2d"
    # f = 0 identically on the finest grid (reference Grid2D.cpp:70-80)
    # AND on every FMG-cascaded level (restriction of zero): finest-leg
    # relax kernels may drop the RHS stream (relax.py f_zero path)
    rhs_is_zero = True
    # the one-sided stencil reads only the +x neighbor: the 2D split
    # slab kernel then carries no bottom halo at all
    split2d_x_offsets = (+1,)
    # one-sided => RBGS is bipartite-reducible: kernel_precompute's
    # (east, south, rhs) coefficient fields, consumed by
    # relax.make_split_reduced_slab_2d (one full sweep = one black-only
    # 3-term update)
    reduced2d_fields = ("a_e", "a_s", "a_f")
    # split_update2d / kernel_update handle f=None (RHS term dropped):
    # kernels may offer their f_zero fast paths
    split_update2d_f_optional = True
    kernel_update_f_optional = True

    def __init__(
        self,
        a_matrix=((-1.0, -2.0), (0.0, -3.0)),
        alpha: float = 2.0,
        p_matrix=((2.0, -2.0), (-2.0, 2.0)),
        domain: tuple[tuple[float, float], ...] = ((0.0, 1.0), (0.0, 1.0)),
    ):
        """`a_matrix` is the system matrix A (must be Hurwitz for a Lyapunov
        function to exist); `p_matrix` the quadratic-form solution matrix P
        with V = [x y] P [x y]^T.  Defaults reproduce the reference driver
        (LyapunovSolver.cpp:13-31)."""
        self.a = np.asarray(a_matrix, dtype=np.float64)
        self.alpha = float(alpha)
        self.p = np.asarray(p_matrix, dtype=np.float64)
        self.domain = tuple(tuple(d) for d in domain)

    def exact_solution(self, coords: tuple[Array, ...]) -> Array:
        x, y = coords
        p = self.p
        return p[0, 0] * x * x + (p[0, 1] + p[1, 0]) * x * y + p[1, 1] * y * y

    def rhs(self, coords: tuple[Array, ...]) -> Array:
        x, _ = coords
        return jnp.zeros_like(x)

    def make_aux(self, geom: LevelGeometry, dtype=jnp.float32):
        x, y = geom.coords(dtype)
        a = self.a
        k1 = (a[0, 0] * x + a[0, 1] * y).astype(dtype)
        k2 = (a[1, 0] * x + a[1, 1] * y).astype(dtype)
        return {"k1": k1, "k2": k2}

    def relax_update(self, v, f, geom: LevelGeometry, aux) -> Array:
        hx = jnp.asarray(geom.spacing[0], v.dtype)
        hy = jnp.asarray(geom.spacing[1], v.dtype)
        k1, k2 = aux["k1"], aux["k2"]
        east = self.shift(v, 0, +1)  # +x neighbor
        south = self.shift(v, 1, +1)  # +y neighbor
        den = k1 * hy + k2 * hx - self.alpha * hx * hy
        return (hy * k1 * east + hx * k2 * south - f * hx * hy) / den

    def apply_operator(self, v, geom: LevelGeometry, aux) -> Array:
        hx = jnp.asarray(geom.spacing[0], v.dtype)
        hy = jnp.asarray(geom.spacing[1], v.dtype)
        k1, k2 = aux["k1"], aux["k2"]
        east = self.shift(v, 0, +1)
        south = self.shift(v, 1, +1)
        return (
            k1 * (east - v) / hx + k2 * (south - v) / hy + self.alpha * v
        )

    # -- implicit-stencil operator form (ops/galerkin.py) -------------------

    def stencil_operator(self, geom: LevelGeometry, aux, dtype=jnp.float32):
        """The one-sided 3-point advection-reaction stencil with spatially
        varying coefficients (center, E=+x, S=+y)."""
        from pde_multigrid_tpu.ops.galerkin import StencilOperator

        hx, hy = geom.spacing
        k1, k2 = aux["k1"], aux["k2"]
        center = -k1 / hx - k2 / hy + self.alpha
        coeffs = jnp.stack(
            [center, k1 / hx, k2 / hy], axis=-1
        ).astype(dtype)
        return StencilOperator(
            offsets=((0, 0), (1, 0), (0, 1)), coeffs=coeffs
        )

    # -- Pallas kernel tier -------------------------------------------------

    def kernel_precompute(self, coords, geom: LevelGeometry, dtype):
        x, y = coords
        hx, hy = geom.spacing
        a = self.a.astype(np.dtype(dtype) if dtype else np.float32)
        k1 = (a[0, 0] * x + a[0, 1] * y).astype(dtype)
        k2 = (a[1, 0] * x + a[1, 1] * y).astype(dtype)
        inv_den = (
            1.0 / (k1 * hy + k2 * hx - self.alpha * hx * hy)
        ).astype(dtype)
        return {
            "a_e": (hy * k1) * inv_den,
            "a_s": (hx * k2) * inv_den,
            "a_f": (-hx * hy) * inv_den,
        }

    def kernel_update(self, v, f, pre, geom: LevelGeometry):
        east = self.shift(v, 0, +1)
        south = self.shift(v, 1, +1)
        upd = east * pre["a_e"] + south * pre["a_s"]
        return upd if f is None else upd + f * pre["a_f"]

    def split_update2d(self, nbr, f, pre, geom: LevelGeometry):
        """Local solve on 2D color-split storage (relax.
        make_split_color_slab_2d): `nbr(axis, off)` gathers the opposite
        color's neighbor; `pre` holds this color's coefficient fields.
        Same math and term order as kernel_update.  `f is None` means a
        statically zero RHS (the f term is dropped entirely)."""
        upd = nbr(0, +1) * pre["a_e"] + nbr(1, +1) * pre["a_s"]
        return upd if f is None else upd + f * pre["a_f"]

    def split_operator2d(self, C, nbr, coords, geom: LevelGeometry):
        """L v evaluated at one color's points in half layout
        (ops/split2d.py persistent-split residual): same math and term
        order as apply_operator, with `nbr` gathering the opposite
        color's E/S neighbors and `coords` this color's own (x, y)."""
        x, y = coords
        hx = jnp.asarray(geom.spacing[0], C.dtype)
        hy = jnp.asarray(geom.spacing[1], C.dtype)
        a = self.a
        k1 = (a[0, 0] * x + a[0, 1] * y).astype(C.dtype)
        k2 = (a[1, 0] * x + a[1, 1] * y).astype(C.dtype)
        east = nbr(0, +1)
        south = nbr(1, +1)
        return (
            k1 * (east - C) / hx + k2 * (south - C) / hy + self.alpha * C
        )

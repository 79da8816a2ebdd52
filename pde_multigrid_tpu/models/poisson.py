"""d-dimensional Poisson problem: laplacian(u) = f, Dirichlet boundary.

The thesis headline case (3D): f = -3 pi^2 sin(pi x) sin(pi y) sin(pi z) on
(0,1)^3, u = 0 on the boundary, exact u = sin(pi x) sin(pi y) sin(pi z)
(thesis eq. 3.4.3-3.4.4; reference Grid3D.cpp:78-96, Poisson3DSolver.cpp).

Discretization: the (2d+1)-point second-order Laplacian.  The relax step is
the anisotropy-ready local solve of thesis eq. 3.4.5 (reference
MultiGrid3D.cpp:489-567), generalized to any d:

    v = ( sum_ax (v_minus + v_plus) / h_ax^2  -  f ) / ( 2 sum_ax 1/h_ax^2 )

Residual: r = f - laplacian_h(v).  The reference's 3D residual has sign
typos on the S and U terms (MultiGrid3D.cpp:723, MultiGrid3D.cu:767 — see
SURVEY.md §2.7.3); we implement the correct symmetric form, which is the
operator the reference's own relax step solves and FMG converges with.

`Poisson` is dimension-generic with arbitrary separable-sine exact
solutions; `Poisson3D()` is the thesis parity configuration.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.models.base import ProblemBase

Array = jax.Array


class Poisson(ProblemBase):
    """laplacian(u) = f with separable product-of-sines manufactured solution

        u(x) = prod_ax sin(k_ax pi x_ax),
        f(x) = -(sum_ax (k_ax pi)^2) u(x),

    which is zero on the boundary of any [0, 1]-aligned box and reduces to
    the thesis test case for ndim=3, k=(1,1,1)."""

    # split_update2d / kernel_update handle f=None (relax.py f_zero paths)
    split_update2d_f_optional = True
    kernel_update_f_optional = True

    def __init__(
        self,
        ndim: int,
        domain: tuple[tuple[float, float], ...] | None = None,
        wavenumbers: tuple[int, ...] | None = None,
    ):
        self.ndim = int(ndim)
        self.name = f"poisson{self.ndim}d"
        self.domain = (
            tuple(tuple(d) for d in domain)
            if domain is not None
            else ((0.0, 1.0),) * self.ndim
        )
        self.k = tuple(wavenumbers) if wavenumbers else (1,) * self.ndim

    def exact_solution(self, coords: tuple[Array, ...]) -> Array:
        u = None
        for k, x in zip(self.k, coords):
            s = jnp.sin(k * math.pi * x)
            u = s if u is None else u * s
        return u

    def rhs(self, coords: tuple[Array, ...]) -> Array:
        lam = sum((k * math.pi) ** 2 for k in self.k)
        return -lam * self.exact_solution(coords)

    def make_aux(self, geom: LevelGeometry, dtype=jnp.float32):
        return {}

    def _inv_h2(self, geom: LevelGeometry, dtype):
        return [
            jnp.asarray(1.0 / (h * h), dtype) for h in geom.spacing
        ]

    def relax_update(self, v, f, geom: LevelGeometry, aux) -> Array:
        inv_h2 = self._inv_h2(geom, v.dtype)
        num = -f
        den = 0.0
        for ax, w in enumerate(inv_h2):
            num = num + (self.shift(v, ax, -1) + self.shift(v, ax, +1)) * w
            den = den + 2.0 * w
        return num / den

    def apply_operator(self, v, geom: LevelGeometry, aux) -> Array:
        inv_h2 = self._inv_h2(geom, v.dtype)
        out = 0.0
        for ax, w in enumerate(inv_h2):
            out = out + (
                self.shift(v, ax, -1) - 2.0 * v + self.shift(v, ax, +1)
            ) * w
        return out

    # -- implicit-stencil operator form (ops/galerkin.py) -------------------

    def stencil_operator(self, geom: LevelGeometry, aux, dtype=jnp.float32):
        """The (2d+1)-point Laplacian as a StencilOperator with
        broadcastable constant coefficients."""
        from pde_multigrid_tpu.ops.galerkin import StencilOperator

        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        offsets = [(0,) * self.ndim]
        coeffs = [-2.0 * sum(inv_h2)]
        for ax, w in enumerate(inv_h2):
            for s in (-1, +1):
                off = [0] * self.ndim
                off[ax] = s
                offsets.append(tuple(off))
                coeffs.append(w)
        c = jnp.asarray(coeffs, dtype).reshape(
            (1,) * self.ndim + (len(offsets),)
        )
        return StencilOperator(offsets=tuple(offsets), coeffs=c)

    # -- line relaxation (anisotropy-robust smoother) -----------------------

    def line_system(self, line_axis: int, geom: LevelGeometry):
        """Tridiagonal system builder for exact line solves along
        `line_axis`: all off-line neighbor terms move to the RHS; boundary
        and padded rows become identity equations (Dirichlet folding)."""
        import numpy as np

        ns = geom.padded_shape
        n_log = geom.shape[line_axis]
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        a_l = inv_h2[line_axis]
        b_diag = -2.0 * sum(inv_h2)
        rows = np.arange(ns[line_axis])
        inter = (rows >= 1) & (rows <= n_log - 2)
        # NOTE: numpy (not jnp) constants — they embed as literals in the
        # traced program instead of becoming lifted closure inputs
        a_rows = np.where(inter, a_l, 0.0).astype(np.float32)
        b_rows = np.where(inter, b_diag, 1.0).astype(np.float32)
        c_rows = np.where(inter, a_l, 0.0).astype(np.float32)
        bshape = [1] * len(ns)
        bshape[line_axis] = ns[line_axis]
        m_row = inter.astype(np.float32).reshape(bshape)

        def build(v, f):
            d = f
            for ax, w in enumerate(inv_h2):
                if ax == line_axis:
                    continue
                d = d - (self.shift(v, ax, -1) + self.shift(v, ax, +1)) * w
            d = v + jnp.asarray(m_row, v.dtype) * (d - v)  # identity rows
            return a_rows, b_rows, c_rows, d

        return build

    def separable_fastdiag(self, geom: LevelGeometry) -> bool:
        """The (2d+1)-point Laplacian is a Kronecker sum of per-axis 1D
        Dirichlet Laplacians — eligible for the fast-diagonalization
        exact coarse solve (ops/fastdiag.py)."""
        return True

    # -- Pallas kernel tier -------------------------------------------------

    def merged_update(self, v, f, shift, geom: LevelGeometry):
        """Local solve for the merged-layout resident kernel
        (ops/pallas/relax.py): same math as kernel_update, but geometric
        shifts are delegated to the layout-aware `shift(a, axis, off)`."""
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        inv_den = 1.0 / (2.0 * sum(inv_h2))
        num = -f
        for ax, w in enumerate(inv_h2):
            num = num + (shift(v, ax, -1) + shift(v, ax, +1)) * w
        return num * inv_den

    def kernel_operator(self, v, geom: LevelGeometry, roll):
        """L v inside fused kernels (ops/pallas/transfer.py): same math
        and accumulation order as apply_operator, with shifts delegated
        to the kernel-local `roll(a, axis, off)`."""
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        out = 0.0
        for ax, w in enumerate(inv_h2):
            out = out + (roll(v, ax, -1) - 2.0 * v + roll(v, ax, +1)) * w
        return out

    def split_update(self, pairs, f, geom: LevelGeometry):
        """Local solve on color-split storage (ops/pallas/relax.py split
        slab kernel): `pairs[ax]` is the (v_minus + v_plus) neighbor pair
        sum along axis `ax`, already gathered from the opposite color.
        Identical accumulation order to kernel_update, so results stay
        bit-compatible with the dense tiers."""
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        inv_den = 1.0 / (2.0 * sum(inv_h2))
        num = -f
        for ax, w in enumerate(inv_h2):
            num = num + pairs[ax] * w
        return num * inv_den

    def split_update_folded(self, pairs, f, geom: LevelGeometry):
        """split_update with the scalar constants pre-folded to minimize
        VPU ops (the ALL-sweeps-resident defect inner is arithmetic-
        bound, ops/pallas/relax.make_split_resident_sweeps).  Isotropic
        spacing folds to (px+py+pz)*c1 - f*c2; anisotropic keeps per-
        axis weights but folds the final reciprocal into them.  Same
        fixed point as split_update, different rounding/accumulation
        order (acceptable: the defect path is tolerance-tested, not
        bit-compared)."""
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        inv_den = 1.0 / (2.0 * sum(inv_h2))
        if len(set(geom.spacing)) == 1:
            s = pairs[0]
            for p in pairs[1:]:
                s = s + p
            return s * (inv_h2[0] * inv_den) - f * inv_den
        out = -f * inv_den
        for p, w in zip(pairs, inv_h2):
            out = out + p * (w * inv_den)
        return out

    def split_update2d(self, nbr, f, pre, geom: LevelGeometry):
        """2D color-split local solve (relax.make_split_color_slab_2d):
        nbr(axis, off) gathers the opposite color's neighbor.  `f is
        None` means a statically zero RHS."""
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        inv_den = 1.0 / (2.0 * sum(inv_h2))
        num = None if f is None else -f
        for ax, w in enumerate(inv_h2):
            pair = (nbr(ax, -1) + nbr(ax, +1)) * w
            num = pair if num is None else num + pair
        return num * inv_den

    def split_operator2d(self, C, nbr, coords, geom: LevelGeometry):
        """L v at one color's points in half layout (ops/split2d.py
        persistent-split residual); same math and term order as
        apply_operator.  Engages only on PADDED 2D storage (the
        homogeneous-Dirichlet default takes wrap storage, which the
        2D split tiers don't cover)."""
        inv_h2 = [
            jnp.asarray(1.0 / (h * h), C.dtype) for h in geom.spacing
        ]
        out = 0.0
        for ax, w in enumerate(inv_h2):
            out = out + (nbr(ax, -1) - 2.0 * C + nbr(ax, +1)) * w
        return out

    def kernel_update(self, v, f, pre, geom: LevelGeometry):
        # constant-coefficient: weights and the reciprocal fold to scalars.
        # Spatial axes are the LAST geom.ndim axes of v (1D problems run
        # as (1, N) inside kernels).  `f is None` means a statically zero
        # RHS (kernel f_zero paths).
        inv_h2 = [1.0 / (h * h) for h in geom.spacing]
        inv_den = 1.0 / (2.0 * sum(inv_h2))
        off = v.ndim - geom.ndim
        num = None if f is None else -f
        for ax, w in enumerate(inv_h2):
            pair = (
                self.shift(v, off + ax, -1) + self.shift(v, off + ax, +1)
            ) * w
            num = pair if num is None else num + pair
        return num * inv_den


def Poisson3D(domain=((0.0, 1.0),) * 3) -> Poisson:
    """The thesis 3D Poisson parity case (Poisson3DSolver.cpp:14-20)."""
    return Poisson(ndim=3, domain=domain)

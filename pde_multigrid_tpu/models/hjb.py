"""Time-optimal ("bang-bang") control of the double integrator via the
Kruzkov-transformed Hamilton-Jacobi-Bellman equation — thesis §3.3.

This is the fourth problem family of the reference: derived in the thesis
(eqs. 3.3.1-3.3.17) but NEVER implemented there — the author reports the
results "non costituivano una valida approssimazione" and excluded it from
the benchmarks (thesis p. 62-63).  We implement it fully, including the
nonlinear multigrid (FAS) machinery the correction scheme lacks.

Problem.  Minimum-time control of  x1' = x2,  x2' = u,  |u| <= 1,  to the
origin.  The value function V(x) (minimum time) satisfies the static HJB
equation  0 = inf_u {1 + V_x1 x2 + V_x2 u} = 1 + x2 V_x1 - |V_x2|
(thesis eq. 3.3.10-3.3.12); the optimal control is bang-bang,
u* = -sign(V_x2) (eq. 3.3.11).  The Kruzkov transform W = 1 - e^{-V}
(eq. 3.3.14) maps V's unbounded growth onto [0, 1) and yields

    N(W) :=  W - x2 W_x1 + |W_x2|  =  1,      W(0) = 0        (eq. 3.3.15)

a NONLINEAR first-order PDE (the |W_x2| term switches with the solution's
own gradient — the bang-bang switching surface).

Analytic oracle.  The double integrator's minimum time is classical
closed form: with the switching curve x1 = -x2 |x2| / 2,

    T(x)  =  x2 + 2 sqrt(x2^2/2 + x1)     right of the curve (u = -1 leg)
    T(x)  = -x2 + 2 sqrt(x2^2/2 - x1)     left  of the curve (u = +1 leg)

and W = 1 - e^{-T}.  Dirichlet data on the domain boundary comes from the
oracle (the thesis instead imposes W = 1 on a "large enough" box, an
approximation it identifies as a weakness); the target condition W(0) = 0
is enforced by pinning the origin grid point (present at every level for
symmetric domains).

Discretizations (`scheme`):
  * "upwind" (default): monotone Godunov scheme.  The advection term
    -x2 W_x1 upwinds by sign(x2) (neighbor E for x2 > 0, W for x2 < 0);
    the eikonal term |W_x2| takes the Godunov form
    max(W - min(S, N), 0)/h2.  The pointwise solve has the classic
    fast-sweeping two-candidate structure and the scheme is monotone, so
    nonlinear red-black Gauss-Seidel converges.
  * "tesi": the thesis' own eq. 3.3.17 — FORWARD differences on both
    axes with three sign branches.  Kept for parity/documentation; it is
    not monotone for x2 < 0 (the denominator h1 h2 + h2 x2 -+ h1 changes
    sign), which is consistent with the thesis' reported failure.

Axes: coords[0] = x1, coords[1] = x2 (matching Lyapunov2D's layout).

Accuracy envelope (cross-validated, rate-pinned).  The value function is
worse than kinked: on the switching curve itself its gradient is INFINITE
(right branch T = x2 + 2 sqrt(x2^2/2 + x1) gives T_x1 -> inf as
x1 -> -x2|x2|/2), i.e. T is Holder-1/2 there, and T ~ 2 sqrt|x| at the
target.  Since every optimal trajectory passes near the curve, the O(1)
truncation there pollutes the whole upstream domain, and ANY first-order
monotone scheme converges at only ~h^0.2 in L-inf GLOBALLY — not the
classical O(sqrt h).  Measured (f32, FMG(1,3,3) FAS to 1e-7 residual):
err_linf 0.2032 / 0.1840 / 0.1625 / 0.1406 at 65/129/257/513, fitted
order 0.176 (tests/test_hjb.py::test_hjb_convergence_order_pinned).  An
independent semi-Lagrangian Kruzkov value iteration (bilinear
interpolation, u in {-1, 1}) reproduces the same envelope (0.1906 /
0.1720 / 0.1520, same order) and agrees with this scheme to 0.017 L-inf
— the error is intrinsic to the discretization order, not the solver:
the discrete system itself is solved to ~1e-6 residual by FAS cycles.
This quantifies (and survives) the failure mode that made the thesis
drop the problem.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.grid import Level, LevelGeometry
from pde_multigrid_tpu.models.base import ProblemBase

Array = jax.Array


def min_time_double_integrator(x1, x2):
    """Closed-form minimum time to the origin for x1'=x2, x2'=u, |u|<=1."""
    half = 0.5 * x2 * jnp.abs(x2)
    right = x1 > -half
    t_r = x2 + 2.0 * jnp.sqrt(jnp.maximum(0.5 * x2 * x2 + x1, 0.0))
    t_l = -x2 + 2.0 * jnp.sqrt(jnp.maximum(0.5 * x2 * x2 - x1, 0.0))
    return jnp.where(right, t_r, t_l)


class HJBMinTime(ProblemBase):
    """Kruzkov-transformed minimum-time HJB for the double integrator."""

    ndim = 2
    name = "hjb2d"
    nonlinear = True  # excludes linear-only machinery (dense coarse solve)

    def __init__(
        self,
        domain: tuple[tuple[float, float], ...] = (
            (-1.0, 1.0),
            (-1.0, 1.0),
        ),
        scheme: str = "upwind",
        pin_radius_cells: float = 2.0,
    ):
        """pin_radius_cells: radius (in units of the level's max grid
        spacing) of the ball around the origin pinned to the exact value.
        T(x) ~ 2 sqrt(|x|) has an infinite gradient at the target, so a
        first-order scheme initialized from the exact solution in an
        O(h)-ball regains its O(h)-away-from-kinks accuracy — the same
        device fast-marching solvers use.  0 pins just the origin point
        (the thesis' W(0) = 0 condition alone)."""
        if scheme not in ("upwind", "tesi"):
            raise ValueError(f"unknown HJB scheme {scheme!r}")
        self.domain = tuple(tuple(d) for d in domain)
        self.scheme = scheme
        self.pin_radius_cells = float(pin_radius_cells)
        # color-split tier default OFF (PDE_MG_HJB_SPLIT2D=1 enables):
        # the hardware A/B at the 513^2 bench config LOST — whole-step
        # slope 76.5 vs 71.6 us/nu interleaved — because the two-sided
        # round_up(2T,8)-row halos make the split ~1.5x-redundant while
        # the dense tier's both-colors waste is only 2x, and the
        # per-leg color conversions add ~0.45 ms fixed.  The kernel
        # path stays tested (test_hjb_kernel_tier_matches_jnp) for
        # larger grids where the halo share shrinks.
        import os

        if scheme != "upwind" or (
            os.environ.get("PDE_MG_HJB_SPLIT2D", "0") != "1"
        ):
            self.split2d_x_offsets = None  # veto the color-split tier

    # -- oracle / data ------------------------------------------------------

    def exact_solution(self, coords: tuple[Array, ...]) -> Array:
        t = min_time_double_integrator(coords[0], coords[1])
        return 1.0 - jnp.exp(-t)

    def rhs(self, coords: tuple[Array, ...]) -> Array:
        return jnp.ones_like(coords[0])

    def make_aux(self, geom: LevelGeometry, dtype=jnp.float32):
        _, x2 = geom.coords(dtype)
        return {"x2": x2}

    def init_level(self, geom: LevelGeometry, dtype=jnp.float32) -> Level:
        lvl = super().init_level(geom, dtype)
        # pin the target region: W(0) = 0 anchors the solution (thesis
        # eq. 3.3.15's second condition); characteristics radiate from
        # it.  Pin a pin_radius_cells * max(h) ball with exact values.
        import numpy as np

        x1, x2 = (np.asarray(c) for c in geom.coords(dtype))
        r0 = self.pin_radius_cells * max(geom.spacing)
        pinned = (x1 * x1 + x2 * x2) <= max(r0, 1e-12) ** 2
        if not pinned.any():
            return lvl
        aux = dict(lvl.aux)
        keep = jnp.asarray(~pinned, lvl.v.dtype)
        for k in ("m_int", "m_red", "m_black"):
            aux[k] = aux[k] * keep
        # exact Dirichlet data inside the pinned ball (W(0) = 0 at the
        # origin itself); masks no longer update these points
        w_exact = self.exact_solution((jnp.asarray(x1), jnp.asarray(x2)))
        v = jnp.where(jnp.asarray(pinned), w_exact.astype(lvl.v.dtype), lvl.v)
        if "bv_ring" in aux:
            # the hoisted Dirichlet ring (base.init_level) was built from
            # the PRE-pin masks; rebuild it so cycles.fmg re-imposes the
            # pinned anchor values too, not zeros
            aux["bv_ring"] = w_exact.astype(lvl.v.dtype) * (
                aux["m_log"] - aux["m_int"]
            )
        return dataclasses.replace(lvl, v=v, aux=aux)

    # -- nonlinear operator and relaxation ----------------------------------

    def _upwind_parts(self, v, geom, aux):
        h1 = jnp.asarray(geom.spacing[0], v.dtype)
        h2 = jnp.asarray(geom.spacing[1], v.dtype)
        x2 = aux["x2"]
        c1 = jnp.abs(x2) / h1
        nb1 = jnp.where(
            x2 > 0, self.shift(v, 0, +1), self.shift(v, 0, -1)
        )
        m2 = jnp.minimum(self.shift(v, 1, +1), self.shift(v, 1, -1))
        c2 = 1.0 / h2
        return c1, nb1, c2, m2

    def apply_operator(self, v, geom: LevelGeometry, aux) -> Array:
        if self.scheme == "tesi":
            h1 = jnp.asarray(geom.spacing[0], v.dtype)
            h2 = jnp.asarray(geom.spacing[1], v.dtype)
            x2 = aux["x2"]
            e = self.shift(v, 0, +1)
            s = self.shift(v, 1, +1)
            # N(W) = W - x2 (E - C)/h1 + |(S - C)/h2| with forward diffs
            return v - x2 * (e - v) / h1 + jnp.abs((s - v) / h2)
        c1, nb1, c2, m2 = self._upwind_parts(v, geom, aux)
        return v + c1 * (v - nb1) + c2 * jnp.maximum(v - m2, 0.0)

    def relax_update(self, v, f, geom: LevelGeometry, aux) -> Array:
        if self.scheme == "tesi":
            return self._relax_tesi(v, f, geom, aux)
        c1, nb1, c2, m2 = self._upwind_parts(v, geom, aux)
        # candidate with the eikonal term inactive / active; the standard
        # fast-sweeping consistency selection (W_in <= m2 <=> inactive)
        w_in = (f + c1 * nb1) / (1.0 + c1)
        w_act = (f + c1 * nb1 + c2 * m2) / (1.0 + c1 + c2)
        return jnp.where(w_in <= m2, w_in, w_act)

    def _relax_tesi(self, v, f, geom: LevelGeometry, aux) -> Array:
        """Thesis eq. 3.3.17 verbatim (generalized to RHS f for coarse
        levels): three branches on sign(W_x2), forward differences."""
        h1 = jnp.asarray(geom.spacing[0], v.dtype)
        h2 = jnp.asarray(geom.spacing[1], v.dtype)
        x2 = aux["x2"]
        e = self.shift(v, 0, +1)
        s = self.shift(v, 1, +1)
        grad2 = (s - v) / h2
        num_pos = f * h1 * h2 + e * h2 * x2 - h1 * s
        den_pos = h1 * h2 + h2 * x2 - h1
        num_neg = f * h1 * h2 + e * h2 * x2 + h1 * s
        den_neg = h1 * h2 + h2 * x2 + h1
        num_zero = f * h1 + e * x2
        den_zero = h1 + x2
        eps = jnp.asarray(1e-12, v.dtype)
        w = jnp.where(
            grad2 > eps,
            num_pos / den_pos,
            jnp.where(grad2 < -eps, num_neg / den_neg, num_zero / den_zero),
        )
        return w

    # -- Pallas kernel tier (ops/pallas/relax.py dense tiers) ---------------

    def kernel_keep_mask(self, coords, geom: LevelGeometry, dtype):
        """Mirror init_level's pinned-ball mask exclusion: the kernel's
        in-register masks must never update the pinned target points."""
        x1, x2 = coords
        r0 = self.pin_radius_cells * max(geom.spacing)
        r2 = jnp.asarray(max(r0, 1e-12) ** 2, dtype)
        return (x1 * x1 + x2 * x2 > r2).astype(dtype)

    def kernel_precompute(self, coords, geom: LevelGeometry, dtype):
        x1, x2 = coords
        h1, h2 = geom.spacing
        if self.scheme == "tesi":
            # thesis eq. 3.3.17 branch denominators as reciprocals
            return {
                "x2": x2.astype(dtype),
                "inv_pos": (1.0 / (h1 * h2 + h2 * x2 - h1)).astype(dtype),
                "inv_neg": (1.0 / (h1 * h2 + h2 * x2 + h1)).astype(dtype),
                "inv_zero": (1.0 / (h1 + x2)).astype(dtype),
            }
        c1 = (jnp.abs(x2) / h1).astype(dtype)
        c2 = 1.0 / h2
        return {
            "c1": c1,
            # upwind side select as a 0/1 blend field (x2 > 0 -> east)
            "s1": (x2 > 0).astype(dtype),
            "inv_in": (1.0 / (1.0 + c1)).astype(dtype),
            "inv_act": (1.0 / (1.0 + c1 + c2)).astype(dtype),
        }

    # color-split slab tier (relax.make_split_color_slab_2d): the
    # upwind scheme reads x+-1 (side-selected by sign(x2)) and y+-1,
    # all of the opposite color — expressible through the nbr callback.
    # The pinned target ball enters through kernel_keep_mask, which the
    # split kernel applies per color (keep-mask support, round 4).
    # __init__ sets split2d_x_offsets = None for the "tesi" scheme
    # (documented-divergent; stays on the dense tiers).
    split2d_x_offsets = (-1, +1)

    def split_update2d(self, nbr, f, pre, geom: LevelGeometry):
        s1 = pre["s1"]
        nb1 = s1 * nbr(0, +1) + (1.0 - s1) * nbr(0, -1)
        m2 = jnp.minimum(nbr(1, +1), nbr(1, -1))
        c1 = pre["c1"]
        c2 = jnp.asarray(1.0 / geom.spacing[1], nb1.dtype)
        base = f + c1 * nb1
        w_in = base * pre["inv_in"]
        w_act = (base + c2 * m2) * pre["inv_act"]
        return jnp.where(w_in <= m2, w_in, w_act)

    def kernel_update(self, v, f, pre, geom: LevelGeometry):
        # spatial axes are the LAST geom.ndim axes of v inside kernels
        ax1 = v.ndim - 2
        ax2 = v.ndim - 1
        e = self.shift(v, ax1, +1)
        if self.scheme == "tesi":
            h1 = jnp.asarray(geom.spacing[0], v.dtype)
            h2 = jnp.asarray(geom.spacing[1], v.dtype)
            x2 = pre["x2"]
            s = self.shift(v, ax2, +1)
            grad2 = (s - v) / h2
            num_pos = f * h1 * h2 + e * h2 * x2 - h1 * s
            num_neg = f * h1 * h2 + e * h2 * x2 + h1 * s
            num_zero = f * h1 + e * x2
            eps = jnp.asarray(1e-12, v.dtype)
            return jnp.where(
                grad2 > eps,
                num_pos * pre["inv_pos"],
                jnp.where(
                    grad2 < -eps,
                    num_neg * pre["inv_neg"],
                    num_zero * pre["inv_zero"],
                ),
            )
        w = self.shift(v, ax1, -1)
        s1 = pre["s1"]
        nb1 = s1 * e + (1.0 - s1) * w
        m2 = jnp.minimum(self.shift(v, ax2, +1), self.shift(v, ax2, -1))
        c1 = pre["c1"]
        c2 = jnp.asarray(1.0 / geom.spacing[1], v.dtype)
        base = f + c1 * nb1
        w_in = base * pre["inv_in"]
        w_act = (base + c2 * m2) * pre["inv_act"]
        return jnp.where(w_in <= m2, w_in, w_act)

"""Cycle schedulers: V-cycle, W/mu-cycle, and Full MultiGrid (FMG).

The recursion over levels is unrolled at trace time (shapes are static per
level), so an entire FMG solve — every sweep, transfer, and correction on
every level — compiles to ONE XLA program and runs as one device dispatch.
Contrast the reference, which pays a kernel launch + a device->host size
memcpy per sweep (SURVEY.md §3.2).

Execution order matches the reference exactly (MultiGrid1D.cpp:132-175 and
3D counterparts):

  VCycle(l):   relax nu1; if not coarsest: r = f - L v; coarse.f = R r;
               coarse.v = 0 (whole array); VCycle(l+1) [x mu]; e = P coarse.v;
               v += e (interior); relax nu2.
  FMG(l):      restrict f down to the coarsest; coarsest v interior = 0;
               then per level, coarsest->finest: nu0 VCycles, and prolong the
               solution (interior) up one level before the next.

mu > 1 gives W-cycles (extension beyond the reference, which has no W-cycle,
SURVEY.md §2.3)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.config import CycleConfig
from pde_multigrid_tpu.grid import Level, LevelGeometry
from pde_multigrid_tpu.ops import stencil

Array = jax.Array
Levels = tuple[Level, ...]


class JnpKernels:
    """Default kernel tier: problem-defined pointwise math + generic
    transfer ops from `ops.stencil`, fully fused by XLA."""

    def __init__(
        self,
        problem,
        geoms: Sequence[LevelGeometry],
        smoother: str = "rbgs",
        omega: float = 1.0,
    ):
        self.problem = problem
        self.geoms = tuple(geoms)
        self.smoother = smoother
        self.omega = omega
        self._line_builders: dict[int, Any] = {}

    def relax(self, l: int, v, f, aux, nsweeps: int, f_zero: bool = False):
        # f_zero: statically-known-zero RHS hint (used by kernel tiers
        # that can drop the f stream; the jnp tier just ignores it)
        g = self.geoms[l]
        if self.smoother == "exact":
            if not hasattr(self.problem, "exact_solve"):
                raise ValueError(
                    f"problem {self.problem.name} has no exact_solve"
                )
            return self.problem.exact_solve(v, f, g, aux)
        if self.smoother.startswith("line-"):
            axis = int(self.smoother[5:])
            if not hasattr(self.problem, "line_system"):
                raise ValueError(
                    f"problem {self.problem.name} has no line_system; "
                    "line relaxation unavailable"
                )
            if l not in self._line_builders:
                self._line_builders[l] = self.problem.line_system(axis, g)
            zebra_axis = (axis + 1) % g.ndim
            return stencil.relax_zebra_line(
                self._line_builders[l],
                v,
                f,
                aux["m_int"],
                axis,
                zebra_axis,
                _zebra_masks(g, zebra_axis, v.dtype),
                nsweeps,
            )
        upd = lambda v_, f_: self.problem.relax_update(v_, f_, g, aux)
        if self.smoother == "jacobi":
            return stencil.relax_jacobi(
                upd, v, f, aux["m_int"], self.omega, nsweeps
            )
        return stencil.relax_rbgs(
            upd, v, f, aux["m_red"], aux["m_black"], nsweeps
        )

    def residual(self, l: int, v, f, aux):
        g = self.geoms[l]
        return stencil.residual(
            lambda v_: self.problem.apply_operator(v_, g, aux),
            v,
            f,
            aux["m_int"],
        )

    def restrict(self, l_fine: int, arr, m_int_coarse, m_log_coarse):
        return stencil.restrict_full_weighting(
            arr, m_int_coarse, m_log_coarse
        )

    def prolong(self, l_fine: int, arr):
        g = self.geoms[l_fine]
        return stencil.prolong_linear(arr, g.padded_shape, periodic=g.wrap)

    # -- optional fused paths (overridden by the Pallas tier; None means
    # "no fused kernel, use the two-step fallback") ------------------------

    def residual_restrict(self, l, v, f, aux, coarse_aux, f_zero=False):
        # f_zero: levels[l].f is a statically-known-zero RHS (rhs_zero
        # problem, RHS-carrying leg) — split-layout tiers drop f streams
        return None

    def restrict_direct(self, l, arr, coarse_aux):
        return None

    def prolong_blend(self, l_fine, base_v, coarse_v, m_int, mode):
        return None


class CycleProgram:
    """Pure functions over a level tuple implementing the configured cycles.

    Instances are cheap; the heavy lifting happens when the returned
    functions are jitted (see solver.MultigridSolver)."""

    def __init__(
        self,
        problem,
        geoms: Sequence[LevelGeometry],
        config: CycleConfig,
        kernels: Any | None = None,
    ):
        self.problem = problem
        self.geoms = tuple(geoms)
        self.config = config
        self.kernels = kernels or JnpKernels(
            problem, geoms, config.smoother, config.omega
        )
        self._rhs_zero = bool(getattr(problem, "rhs_is_zero", False))
        self._coarse_solvers: list[Any] = [None] * len(self.geoms)
        if config.coarsest == "exact" and config.scheme == "cs":
            # built EAGERLY: the dense path probes the operator and
            # inverts on the host, which must not happen inside a trace
            from pde_multigrid_tpu.ops import fastdiag

            fn = fastdiag.make_coarse_solve(problem, self.geoms[-1])
            if fn is None:
                raise ValueError(
                    "coarsest='exact' unsupported here: problem "
                    f"{problem.name} is nonlinear or the coarsest level "
                    "is too large for a direct solve (truncate with "
                    "num_levels)"
                )
            self._coarse_solvers[-1] = fn

    # -- building blocks ---------------------------------------------------

    def _coarse_solve(self, l: int):
        return self._coarse_solvers[l]

    def _fused(self, name: str, *args):
        """Optional fused-kernel hook on the kernel tier; None selects the
        two-step fallback (kernel classes may omit the hooks entirely)."""
        fn = getattr(self.kernels, name, None)
        return None if fn is None else fn(*args)

    def _relax(
        self, levels: Levels, l: int, nsweeps: int, f_zero: bool = False
    ) -> Levels:
        if nsweeps == 0:
            return levels
        lvl = levels[l]
        v = self.kernels.relax(
            l, lvl.v, lvl.f, lvl.aux, nsweeps, f_zero=f_zero
        )
        return _set(levels, l, dataclasses.replace(lvl, v=v))

    def v_cycle(
        self, levels: Levels, l: int = 0, f_is_rhs: bool = True
    ) -> Levels:
        # f_is_rhs: levels[l].f is the (possibly FMG-cascaded) problem
        # RHS, not a restricted residual — combined with rhs_is_zero
        # problems the relax legs at this level may drop the f stream
        if self.config.scheme == "fas":
            return self.fas_v_cycle(levels, l)
        cfg = self.config
        if cfg.coarsest == "exact" and l == len(self.geoms) - 1:
            # fast-diagonalization direct solve replaces the reference's
            # nu1+nu2 coarsest sweeps (ops/fastdiag.py): strictly better
            # coarse-grid correction, nu-independent cost.  The fused
            # tier implements it in-kernel (subtree exact_coarse).
            lvl = levels[l]
            v = self._fused("fused_vcycle", l, lvl.v, lvl.f)
            if v is None:
                v = self._coarse_solve(l)(lvl.v, lvl.f, lvl.aux)
            return _set(levels, l, dataclasses.replace(lvl, v=v))
        # whole-subtree fused kernels (ops/pallas/subtree.py): deeper
        # levels are pure V-cycle temporaries in the correction scheme
        # (coarse v zeroed / coarse f overwritten before every use), so a
        # fused call leaves their stored state untouched — any later
        # consumer re-initializes it first.
        full = self._fused("fused_vcycle", l, levels[l].v, levels[l].f)
        if full is not None:
            return _set(
                levels, l, dataclasses.replace(levels[l], v=full)
            )
        fz = f_is_rhs and self._rhs_zero
        levels = self._relax(levels, l, cfg.nu1, f_zero=fz)
        if l != len(self.geoms) - 1:
            fine = levels[l]
            vc = self._fused("fused_correction", l, fine.v, fine.f)
            if vc is not None:
                levels = _set(
                    levels, l, dataclasses.replace(fine, v=vc)
                )
                return self._relax(levels, l, cfg.nu2, f_zero=fz)
            coarse = levels[l + 1]
            cf = self._fused(
                "residual_restrict", l, fine.v, fine.f, fine.aux,
                coarse.aux, fz,
            )
            if cf is None:
                r = self.kernels.residual(l, fine.v, fine.f, fine.aux)
                cf = self.kernels.restrict(
                    l, r, coarse.aux["m_int"], coarse.aux["m_log"]
                )
            # zero the whole coarse error vector, boundary included
            # (reference setToValue(coarse.v, 0, true), MultiGrid1D.cpp:158)
            cv = jnp.zeros_like(coarse.v)
            levels = _set(
                levels, l + 1, dataclasses.replace(coarse, v=cv, f=cf)
            )
            for _ in range(cfg.mu):
                levels = self.v_cycle(levels, l + 1, f_is_rhs=False)
            fine = levels[l]
            v = self._fused(
                "prolong_blend",
                l,
                fine.v,
                levels[l + 1].v,
                fine.aux["m_int"],
                "add",
            )
            if v is None:
                err = self.kernels.prolong(l, levels[l + 1].v)
                v = stencil.apply_correction(
                    fine.v, err, fine.aux["m_int"]
                )
            levels = _set(levels, l, dataclasses.replace(fine, v=v))
        levels = self._relax(levels, l, cfg.nu2, f_zero=fz)
        return levels

    def fas_v_cycle(self, levels: Levels, l: int = 0) -> Levels:
        """Full Approximation Scheme V-cycle (nonlinear multigrid).

        Extension beyond the reference (SURVEY.md §2.3: "no FAS"): the
        coarse level solves the full nonlinear equation
            N_c(v_c) = N_c(Rhat v_f) + R (f_f - N_f(v_f))
        starting from Rhat v_f (injection), and the fine level receives
        the coarse CHANGE, v_f += P (v_c - Rhat v_f).  Required for
        nonlinear operators (models/hjb.py); reduces exactly to the
        correction scheme for linear N."""
        cfg = self.config
        levels = self._relax(levels, l, cfg.nu1)
        if l != len(self.geoms) - 1:
            fine = levels[l]
            coarse = levels[l + 1]
            r = self.kernels.residual(l, fine.v, fine.f, fine.aux)
            rc = self.kernels.restrict(
                l, r, coarse.aux["m_int"], coarse.aux["m_log"]
            )
            v0c = stencil.inject(fine.v, coarse.v.shape)
            # f_c = N_c(v0c) + R r on the interior; m_int*(N_c v) is
            # exactly -residual(v, 0)
            zero = jnp.zeros_like(v0c)
            fc = rc - self.kernels.residual(l + 1, v0c, zero, coarse.aux)
            levels = _set(
                levels, l + 1, dataclasses.replace(coarse, v=v0c, f=fc)
            )
            for _ in range(cfg.mu):
                levels = self.fas_v_cycle(levels, l + 1)
            err_c = levels[l + 1].v - v0c
            fine = levels[l]
            err = self.kernels.prolong(l, err_c)
            v = stencil.apply_correction(fine.v, err, fine.aux["m_int"])
            levels = _set(levels, l, dataclasses.replace(fine, v=v))
        levels = self._relax(levels, l, cfg.nu2)
        return levels

    def fmg(self, levels: Levels) -> Levels:
        cfg = self.config
        nlev = len(self.geoms)
        # FMG defines its own initial guess, so re-impose every level's
        # Dirichlet data first: prior cycles zero coarse-level boundaries
        # (there coarse v holds the *error*, reference MultiGrid1D.cpp:158),
        # which would poison the upward leg — where v holds the *solution* —
        # on nonzero-boundary problems if solve_step reruns on solved state.
        # Wrap geometries keep an invariant zero boundary plane; skip them.
        for l, geom in enumerate(self.geoms):
            if geom.wrap:
                continue
            lvl = levels[l]
            ring = lvl.aux.get("bv_ring")
            if ring is None:
                bv = self.problem.boundary_values(
                    geom.coords(lvl.v.dtype)
                ).astype(lvl.v.dtype)
                ring = bv * (lvl.aux["m_log"] - lvl.aux["m_int"])
            v = lvl.v * lvl.aux["m_int"] + ring
            levels = _set(levels, l, dataclasses.replace(lvl, v=v))
        # cascade the RHS down (reference FMG restricts fine.f -> coarse.f
        # before recursing, MultiGrid1D.cpp:132-140)
        if self._rhs_zero:
            # full weighting of an identically-zero RHS is zero at every
            # level, exactly — write zeros directly instead of running
            # the transfer kernels (the coarse f arrays must still be
            # written: earlier cycles left restricted residuals there)
            for l in range(1, nlev):
                coarse = levels[l]
                levels = _set(
                    levels,
                    l,
                    dataclasses.replace(
                        coarse, f=jnp.zeros_like(coarse.f)
                    ),
                )
        else:
            for l in range(nlev - 1):
                coarse = levels[l + 1]
                cf = self._fused(
                    "restrict_direct", l, levels[l].f, coarse.aux
                )
                if cf is None:
                    cf = self.kernels.restrict(
                        l,
                        levels[l].f,
                        coarse.aux["m_int"],
                        coarse.aux["m_log"],
                    )
                levels = _set(
                    levels, l + 1, dataclasses.replace(coarse, f=cf)
                )
        # coarsest: zero interior, keep Dirichlet boundary
        bot = levels[-1]
        v0 = stencil.set_interior(bot.v, 0.0, bot.aux["m_int"])
        levels = _set(levels, nlev - 1, dataclasses.replace(bot, v=v0))
        # upward leg: nu0 V-cycles per level, then prolong the solution
        for l in range(nlev - 1, -1, -1):
            # an exact coarsest "V-cycle" is a direct solve — idempotent,
            # so repeating it nu0 times is pure waste
            reps = (
                1
                if cfg.coarsest == "exact" and l == nlev - 1
                else cfg.nu0
            )
            for _ in range(reps):
                levels = self.v_cycle(levels, l)
            if l > 0:
                fine = levels[l - 1]
                v = self._fused(
                    "prolong_blend",
                    l - 1,
                    fine.v,
                    levels[l].v,
                    fine.aux["m_int"],
                    "replace",
                )
                if v is None:
                    vfine = self.kernels.prolong(l - 1, levels[l].v)
                    v = fine.v + fine.aux["m_int"] * (vfine - fine.v)
                levels = _set(levels, l - 1, dataclasses.replace(fine, v=v))
        return levels

    def solve_step(self, levels: Levels) -> Levels:
        """One iteration of the configured schedule on the finest level."""
        if self.config.kind == "fmg":
            return self.fmg(levels)
        return self.v_cycle(levels, 0)

    # -- diagnostics -------------------------------------------------------

    def residual_norms(self, levels: Levels, l: int = 0):
        """(L2-mean, Linf) norms of the level-`l` residual."""
        lvl = levels[l]
        r = self.kernels.residual(l, lvl.v, lvl.f, lvl.aux)
        n_log = jnp.sum(lvl.aux["m_log"])
        l2 = jnp.sqrt(jnp.sum(r * r) / n_log)
        linf = jnp.max(jnp.abs(r))
        return l2, linf


def _set(levels: Levels, i: int, new: Level) -> Levels:
    return levels[:i] + (new,) + levels[i + 1 :]


def _zebra_masks(geom: LevelGeometry, zebra_axis: int, dtype):
    """(even, odd) parity masks along one axis, broadcastable.

    numpy constants on purpose: they embed as program literals rather
    than lifted closure inputs (which break AOT lowered+compiled calls)."""
    import numpy as np

    n = geom.padded_shape[zebra_axis]
    shape = [1] * geom.ndim
    shape[zebra_axis] = n
    par = (np.arange(n) % 2).reshape(shape)
    npdt = np.dtype(dtype)
    return ((par == 0).astype(npdt), (par == 1).astype(npdt))

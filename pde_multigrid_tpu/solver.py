"""High-level solver API.

    problem = Poisson3D()
    solver = MultigridSolver(problem, shape=129,
                             config=SolverConfig(cycle=CycleConfig("fmg", 2, 2, 2)))
    result = solver.solve()
    result.error_linf, result.residual_l2, result.v

Replaces the reference's six hard-coded main() drivers (SURVEY.md §1
"Driver / problem setup") with one configurable entry point; verification
against the analytic oracle replaces the Print*/log-file inspection flow
(SURVEY.md §3.4)."""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.config import CycleConfig, SolverConfig
from pde_multigrid_tpu.cycles import CycleProgram, JnpKernels
from pde_multigrid_tpu.grid import Hierarchy, Level

Array = jax.Array


@dataclasses.dataclass
class SolveResult:
    v: Array  # finest-level solution
    residual_l2: float
    residual_linf: float
    error_l2: float | None  # vs analytic oracle (None if no oracle)
    error_linf: float | None
    error_mae: float | None  # interior mean absolute error (reference's
    # PrintMeanAbsoluteError metric, Grid2D.cu:123-154)
    cycles_run: int
    residual_history: list[float]
    wall_time_s: float
    compile_time_s: float
    diverged: bool = False


def _pick_kernels(
    problem, geoms, backend: str, dtype, cycle: CycleConfig, precision="f32"
):
    # the fused Pallas tier implements the reference smoother (RBGS);
    # jacobi/line smoothers run on the jnp tier
    if backend in ("auto", "pallas") and cycle.smoother == "rbgs":
        from pde_multigrid_tpu.ops.pallas import dispatch as pallas_dispatch

        k = pallas_dispatch.make_kernels(
            problem,
            geoms,
            dtype=dtype,
            force=(backend == "pallas"),
            cycle=cycle,
            precision=precision,
        )
        if k is not None:
            return k
        if backend == "pallas":
            raise ValueError(
                f"no pallas kernels available for problem {problem.name}"
            )
    return JnpKernels(problem, geoms, cycle.smoother, cycle.omega)


def _has_zero_boundary(problem, shape, dtype) -> bool:
    """True iff the problem's Dirichlet data vanishes on every face of the
    finest grid (checked eagerly on face slices; enables wrap storage).
    Evaluated on the CPU backend — this is init-time host work and must
    not touch (or wait on) the accelerator."""
    import numpy as np

    if isinstance(shape, int):
        shape = (shape,) * problem.ndim
    npdt = np.dtype(dtype)
    axes = []
    for a in range(problem.ndim):
        lo, hi = problem.domain[a]
        h = (hi - lo) / (shape[a] - 1)
        axes.append(
            (npdt.type(lo) + np.arange(shape[a], dtype=npdt) * npdt.type(h))
        )
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        for ax in range(problem.ndim):
            for side in (0, shape[ax] - 1):
                face_axes = list(axes)
                face_axes[ax] = axes[ax][side : side + 1]
                coords = np.meshgrid(*face_axes, indexing="ij")
                bv = np.asarray(
                    problem.boundary_values(tuple(coords))
                )
                if np.max(np.abs(bv)) > 1e-7:
                    return False
    return True


class MultigridSolver:
    """Single-chip or multi-chip multigrid solver.

    Pass `mesh` (a 1-axis jax.sharding.Mesh) for spatial domain
    decomposition: fine levels shard along axis 0 with explicit
    shard_map+ppermute halo-exchange relaxation; small levels agglomerate
    to a replicated layout (parallel/).  pad_axis0_to is forced to the
    mesh size for divisibility."""

    def __init__(
        self,
        problem,
        shape: int | tuple[int, ...],
        config: SolverConfig | None = None,
        mesh=None,
    ):
        self.config = config or SolverConfig()
        self.mesh = mesh
        if mesh is not None:
            from pde_multigrid_tpu.parallel.mesh import SHARD_AXIS

            n_dev = mesh.shape[SHARD_AXIS]
            if self.config.pad_axis0_to % n_dev:
                self.config = dataclasses.replace(
                    self.config,
                    pad_axis0_to=self.config.pad_axis0_to * n_dev,
                )
        dtype = jnp.dtype(self.config.dtype)
        # auto padding: the Pallas kernel tier needs tile-aligned physical
        # shapes (sublane 8, lane 128); resolve before building the arrays
        pad_last, pad_sub = self.config.pad_last_to, self.config.pad_sublane_to
        if pad_last == 0 or pad_sub == 0:
            from pde_multigrid_tpu.ops.pallas import dispatch as _pd

            pallas_active = self.config.backend in ("auto", "pallas") and (
                self.config.backend == "pallas" or _pd.is_tpu_backend()
            ) and dtype == jnp.dtype("float32")
            if pad_last == 0:
                pad_last = 128 if pallas_active else 1
            if pad_sub == 0:
                pad_sub = 8 if pallas_active else 1
        # storage mode: wrap storage (zero-waste 2^k arrays) requires
        # homogeneous Dirichlet data; galerkin coarsening probes RAP with
        # the wrap-aware transfer ops, so the combination is supported
        wrap = False
        if self.config.storage in ("auto", "wrap"):
            wrap = _has_zero_boundary(problem, shape, dtype)
            if self.config.storage == "wrap" and not wrap:
                raise ValueError(
                    "storage='wrap' requires homogeneous Dirichlet data"
                )
        # coarsest='exact' makes deep recursion pointless: truncate the
        # hierarchy at the SHALLOWEST level the direct solver handles —
        # fast diagonalization (wrap separable problems, stored extent
        # <= 32: a handful of small contractions) or the probed dense
        # inverse (any linear problem, interior <= DENSE_COARSE_MAX)
        num_levels = self.config.num_levels
        if num_levels is None and self.config.cycle.coarsest == "exact":
            import math as _math

            from pde_multigrid_tpu.grid import (
                coarsen_shape,
                num_levels_for,
            )
            from pde_multigrid_tpu.ops import fastdiag as _fd

            shp = (
                (shape,) * problem.ndim
                if isinstance(shape, int)
                else tuple(shape)
            )
            total = num_levels_for(shp)
            num_levels = total
            cur = shp
            for l in range(total):
                if l:
                    cur = coarsen_shape(cur)
                n_int = _math.prod(max(n - 2, 1) for n in cur)
                # separable fast diagonalization: a 65^3 solve is ~6
                # HIGHEST-precision einsums — measured CHEAPER than
                # running the level-64 multigrid machinery at 129^3
                sep_ok = (
                    wrap
                    and hasattr(problem, "separable_fastdiag")
                    and max(cur) <= 65
                )
                if sep_ok or n_int <= _fd.DENSE_COARSE_MAX:
                    # keep >= 2 levels so every configured cycle still
                    # exercises the multigrid path (num_levels=1 — a pure
                    # direct solve — remains available explicitly)
                    num_levels = max(2, l + 1) if total > 1 else 1
                    break
        self.hierarchy = Hierarchy.build(
            problem,
            shape,
            num_levels=num_levels,
            dtype=dtype,
            pad_axis0_to=self.config.pad_axis0_to,
            pad_last_to=pad_last,
            pad_sublane_to=pad_sub,
            wrap=wrap,
        )
        self.problem = problem
        self.geoms = self.hierarchy.geoms
        self._galerkin_coeffs = None
        if self.config.cycle.coarse_operator == "galerkin":
            from pde_multigrid_tpu.ops.galerkin import (
                GalerkinKernels,
                galerkin_hierarchy,
            )

            if mesh is not None:
                # explicit, not silent (cf. the galerkin x wrap fix):
                # the sharded tier has no stencil-coefficient relax path
                raise ValueError(
                    "coarse_operator='galerkin' is not supported on a "
                    "device mesh yet; drop mesh= or use rediscretize"
                )
            if not hasattr(problem, "stencil_operator"):
                raise ValueError(
                    f"problem {problem.name} has no stencil_operator; "
                    "galerkin coarsening unavailable"
                )
            lv0 = self.hierarchy.levels
            ops = galerkin_hierarchy(
                problem.stencil_operator(
                    self.geoms[0], lv0[0].aux, dtype
                ),
                self.geoms,
                [l.aux for l in lv0],
            )
            self._galerkin_coeffs = [op.coeffs for op in ops]
            # same backend semantics as _pick_kernels: "pallas" forces
            # (interpreter mode off-TPU, for tests), "auto" engages on
            # real TPU only, "jnp" stays on the jnp tier
            from pde_multigrid_tpu.ops.pallas import dispatch as _pd

            if dtype == jnp.dtype("float32") and (
                self.config.backend == "pallas"
                or (
                    self.config.backend == "auto"
                    and _pd.is_tpu_backend()
                )
            ):
                gal_pallas = (
                    "tpu" if _pd.is_tpu_backend() else "interpret"
                )
            else:
                gal_pallas = "off"
            kernels = GalerkinKernels(
                problem,
                self.geoms,
                [op.offsets for op in ops],
                smoother=self.config.cycle.smoother,
                omega=self.config.cycle.omega,
                pallas=gal_pallas,
            )
        elif mesh is not None:
            from pde_multigrid_tpu.parallel.sharded import ShardedKernels

            kernels = ShardedKernels(
                problem,
                self.geoms,
                mesh,
                dtype=dtype,
                smoother=self.config.cycle.smoother,
                omega=self.config.cycle.omega,
                sweeps_per_exchange=self.config.sweeps_per_exchange,
            )
        else:
            kernels = _pick_kernels(
                problem,
                self.geoms,
                self.config.backend,
                dtype,
                self.config.cycle,
                self.config.precision,
            )
        self.program = CycleProgram(
            problem, self.geoms, self.config.cycle, kernels
        )
        # one compiled program per (hierarchy, cycle config)
        self._step = jax.jit(self.program.solve_step, donate_argnums=0)
        self._vstep = jax.jit(
            lambda lv: self.program.v_cycle(lv, 0), donate_argnums=0
        )
        self._norms = jax.jit(self.program.residual_norms)

    def fresh_levels(self):
        """Freshly initialized levels. Rebuilt per call because the jitted
        steps donate their input buffers (in-place update on device)."""
        dtype = jnp.dtype(self.config.dtype)
        levels = tuple(
            self.problem.init_level(g, dtype=dtype) for g in self.geoms
        )
        if self._galerkin_coeffs is not None:
            levels = tuple(
                dataclasses.replace(
                    lvl,
                    aux={**lvl.aux, "stencil_coeffs": c},
                )
                for lvl, c in zip(levels, self._galerkin_coeffs)
            )
        if self.mesh is not None:
            from pde_multigrid_tpu.parallel.mesh import shard_levels

            levels = shard_levels(self.mesh, levels, self.geoms)
        return levels

    # -- main entry points -------------------------------------------------

    def solve(self, levels=None) -> SolveResult:
        """Run the configured schedule once (the reference's usage: a single
        FullMultiGridVCycle call per run, e.g. Poisson3DSolver.cpp:34)."""
        levels = tuple(levels) if levels is not None else self.fresh_levels()
        t_c0 = time.perf_counter()
        lowered = self._step.lower(levels).compile()
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        levels = lowered(levels)
        jax.block_until_ready(levels)
        wall = time.perf_counter() - t0
        return self._finalize(levels, 1, [], wall, compile_s)

    def solve_to_tolerance(self, levels=None, metrics=None) -> SolveResult:
        """FMG (if configured) followed by V-cycles until the finest-level
        L2 residual is below config.tol or max_cycles is reached.

        Divergence guard (SURVEY.md §5 "failure detection"): stops early if
        the residual goes non-finite or exceeds divergence_factor x the
        best seen.  `metrics` (utils.MetricsLogger) gets one record per
        cycle: residual, reduction factor rho, wall time."""
        cfg = self.config
        levels = tuple(levels) if levels is not None else self.fresh_levels()
        t_c0 = time.perf_counter()
        step = self._step.lower(levels).compile()
        vstep = self._vstep.lower(levels).compile()
        compile_s = time.perf_counter() - t_c0
        history: list[float] = []
        diverged = False
        t0 = time.perf_counter()
        levels = step(levels)
        l2, _ = self._norms(levels)
        history.append(float(l2))
        if metrics:
            metrics.cycle(0, history[-1], None, kind=cfg.cycle.kind)
        if not np.isfinite(history[-1]):
            # NaN compares False against any tolerance — catch it before
            # the while condition silently reports convergence
            diverged = True
        best = history[-1]
        n = 1
        while history[-1] > cfg.tol and n < cfg.max_cycles:
            t_c = time.perf_counter()
            levels = vstep(levels)
            l2, _ = self._norms(levels)
            history.append(float(l2))
            if metrics:
                metrics.cycle(
                    n,
                    history[-1],
                    history[-2],
                    kind="v",
                    cycle_s=round(time.perf_counter() - t_c, 6),
                )
            if not np.isfinite(history[-1]) or (
                history[-1] > cfg.divergence_factor * best
            ):
                diverged = True
                break
            best = min(best, history[-1])
            n += 1
        jax.block_until_ready(levels)
        wall = time.perf_counter() - t0
        res = self._finalize(levels, n, history, wall, compile_s)
        res.diverged = diverged
        return res

    # -- verification ------------------------------------------------------

    def _finalize(
        self, levels, cycles: int, history, wall: float, compile_s: float
    ) -> SolveResult:
        l2, linf = self._norms(levels)
        fin = levels[0]
        geo = self.geoms[0]
        exact = self.problem.exact_solution(geo.coords(fin.v.dtype))
        diff = (fin.v - exact) * fin.aux["m_int"]
        n_int = float(jnp.sum(fin.aux["m_int"]))
        err_l2 = float(jnp.sqrt(jnp.sum(diff * diff) / n_int))
        err_linf = float(jnp.max(jnp.abs(diff)))
        err_mae = float(jnp.sum(jnp.abs(diff)) / n_int)
        return SolveResult(
            v=fin.v,
            residual_l2=float(l2),
            residual_linf=float(linf),
            error_l2=err_l2,
            error_linf=err_linf,
            error_mae=err_mae,
            cycles_run=cycles,
            residual_history=list(history),
            wall_time_s=wall,
            compile_time_s=compile_s,
        )

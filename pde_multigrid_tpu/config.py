"""Configuration dataclasses (the reference has none — every parameter is
hard-coded in main(), SURVEY.md §5 "Config / flag system").

All fields are static Python data: a config value change triggers exactly
one recompile of the cycle program, which is the intended jit granularity.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

CycleKind = Literal["v", "w", "fmg"]


@dataclasses.dataclass(frozen=True)
class CycleConfig:
    """Multigrid schedule parameters.

    nu0: V-cycles per FMG level (reference v0); nu1/nu2: pre-/post-smoothing
    sweeps (reference v1/v2); mu: recursion count at each level (1 = V-cycle,
    2 = W-cycle — an extension, the reference has V/FMG only, SURVEY.md §2.3).
    """

    kind: CycleKind = "fmg"
    nu0: int = 2
    nu1: int = 2
    nu2: int = 2
    mu: int = 1
    # smoother: "rbgs" (reference semantics), "jacobi" (damped, omega),
    # "line-K" (zebra line relaxation along axis K — anisotropy-robust,
    # needs a problem with line_system support), or "exact" (problems with
    # a direct solver, e.g. the 1D ODE's associative-scan solve)
    smoother: str = "rbgs"
    omega: float = 1.0
    # coarse-grid operators: "rediscretize" (reference semantics — each
    # level re-derives the PDE at its own spacing) or "galerkin" (A_c =
    # R A_f P via the implicit-stencil layer, ops/galerkin.py)
    coarse_operator: str = "rediscretize"
    # coarse-grid correction scheme: "cs" (linear correction scheme, the
    # reference's method) or "fas" (Full Approximation Scheme — required
    # for nonlinear operators such as the HJB problem, thesis §3.3;
    # equivalent to "cs" for linear operators)
    scheme: str = "cs"
    # coarsest-level solver: "relax" (reference semantics — nu1+nu2
    # sweeps, MultiGrid1D.cpp:150-175) or "exact" (fast-diagonalization
    # direct solve, ops/fastdiag.py — separable wrap-storage problems;
    # pair with SolverConfig.num_levels to truncate the hierarchy at a
    # coarsest level worth solving exactly)
    coarsest: str = "relax"

    def __post_init__(self):
        if self.kind not in ("v", "w", "fmg"):
            raise ValueError(f"unknown cycle kind {self.kind!r}")
        if min(self.nu0, self.nu1, self.nu2, self.mu) < 0:
            raise ValueError("cycle counts must be non-negative")
        ok = self.smoother in ("rbgs", "jacobi", "exact") or (
            self.smoother.startswith("line-")
            and self.smoother[5:].isdigit()
        )
        if not ok:
            raise ValueError(f"unknown smoother {self.smoother!r}")
        if self.coarse_operator not in ("rediscretize", "galerkin"):
            raise ValueError(
                f"unknown coarse_operator {self.coarse_operator!r}"
            )
        if self.scheme not in ("cs", "fas"):
            raise ValueError(f"unknown scheme {self.scheme!r}")
        if self.coarsest not in ("relax", "exact"):
            raise ValueError(f"unknown coarsest {self.coarsest!r}")
        if self.coarsest == "exact" and self.scheme == "fas":
            raise ValueError(
                "coarsest='exact' is a linear direct solve; FAS needs "
                "the nonlinear relax recursion"
            )
        if self.coarsest == "exact" and self.coarse_operator == "galerkin":
            raise ValueError(
                "coarsest='exact' diagonalizes the rediscretized "
                "separable operator, not a Galerkin coarse operator"
            )
        if self.scheme == "fas" and self.coarse_operator == "galerkin":
            raise ValueError(
                "FAS re-evaluates the nonlinear operator per level; "
                "galerkin coarse operators are a linear-only concept"
            )


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    cycle: CycleConfig = CycleConfig()
    dtype: str = "float32"  # reference is float32 throughout (SURVEY.md §2.7.9)
    backend: Literal["auto", "jnp", "pallas"] = "auto"
    # "mixed": keep the iterate/residual path in `dtype` but smooth each
    # long relax leg via bf16 defect correction (ops/pallas/defect.py) —
    # ~2x HBM-traffic cut on slab-tier levels, same f32 fixed point
    precision: Literal["f32", "mixed"] = "f32"
    num_levels: int | None = None  # None = down to 3 points/axis
    # storage: "auto" picks wrap storage (N-1 = 2^k points per axis, the
    # zero boundary plane shared via roll wraparound — no padding waste)
    # for homogeneous-Dirichlet problems, padded storage otherwise
    storage: Literal["auto", "padded", "wrap"] = "auto"
    # physical padding: round axis-0 extent up to a multiple (device-mesh
    # divisibility) and last-axis extent (TPU lane alignment); padding is
    # inert (mask-gated) everywhere
    pad_axis0_to: int = 1
    pad_last_to: int = 0   # 0 = auto (128 when the Pallas tier is active)
    pad_sublane_to: int = 0  # 0 = auto (8 when the Pallas tier is active)
    # convergence-mode controls (solve_to_tolerance):
    tol: float = 1e-8
    max_cycles: int = 100
    # failure detection: stop when the residual is non-finite or exceeds
    # this factor times the best residual seen (SURVEY.md §5)
    divergence_factor: float = 1e3
    # sharded smoother: local sweeps per halo exchange (trapezoidal
    # chunking, parallel/halo.py).  T=4 amortizes the ppermute pair over
    # 4 red-black sweeps at the cost of 2T-row halos; shards too thin
    # for the halo fall back to the GSPMD-partitioned jnp tier
    sweeps_per_exchange: int = 4

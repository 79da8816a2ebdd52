"""pde_multigrid_tpu — a TPU-native geometric multigrid framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the reference
C++/CUDA thesis codebase MisterPup/PDE-MultiGrid (see /root/reference and
SURVEY.md): Full MultiGrid V-cycles with red-black Gauss-Seidel relaxation,
full-weighting restriction and (tri)linear prolongation for three problem
families (1D first-order linear ODE, 2D Lyapunov PDE, 3D Poisson), plus
TPU-first extensions: Pallas stencil kernels, implicit-stencil/Galerkin
coarse operators, W-/mu-cycles, line relaxation, and multi-chip spatial
domain decomposition over a `jax.sharding.Mesh` with halo exchange.

Unlike the reference's six copy-pasted mini-apps (SURVEY.md §1), this package
has ONE dimension-generic core: a problem is (operator, local relax solve,
boundary spec, analytic oracle); a level is a pytree of (v, f); cycles are
schedulers over the level hierarchy, traced once and compiled by XLA.
"""

from pde_multigrid_tpu.grid import Level, LevelGeometry, Hierarchy
from pde_multigrid_tpu.config import CycleConfig, SolverConfig
from pde_multigrid_tpu.solver import MultigridSolver, SolveResult
from pde_multigrid_tpu.models import (
    HJBMinTime,
    Lyapunov2D,
    Ode1D,
    Poisson,
    Poisson3D,
    VariableCoefficientPoisson,
)

__version__ = "0.1.0"

__all__ = [
    "Level",
    "LevelGeometry",
    "Hierarchy",
    "CycleConfig",
    "SolverConfig",
    "MultigridSolver",
    "SolveResult",
    "Ode1D",
    "HJBMinTime",
    "Lyapunov2D",
    "Poisson",
    "Poisson3D",
    "VariableCoefficientPoisson",
]

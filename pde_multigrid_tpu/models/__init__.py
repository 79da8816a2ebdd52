"""Problem families ("models") solvable by the multigrid core.

Reference parity set (SURVEY.md §2.5):
  * `Ode1D`      — 1D first-order linear ODE u' - u/(e^x+1) = e^x.
  * `Lyapunov2D` — 2D Lyapunov PDE dV·(Ax) = -alpha V.
  * `Poisson`    — d-dimensional Poisson -ish: laplacian(u) = f (1D/2D/3D),
                   with the thesis 3D separable-sine test case `Poisson3D`.
"""

from pde_multigrid_tpu.models.base import Problem
from pde_multigrid_tpu.models.ode1d import Ode1D
from pde_multigrid_tpu.models.lyapunov2d import Lyapunov2D
from pde_multigrid_tpu.models.poisson import Poisson, Poisson3D
from pde_multigrid_tpu.models.varcoef import VariableCoefficientPoisson
from pde_multigrid_tpu.models.hjb import HJBMinTime

__all__ = [
    "Problem",
    "Ode1D",
    "Lyapunov2D",
    "Poisson",
    "Poisson3D",
    "VariableCoefficientPoisson",
    "HJBMinTime",
]

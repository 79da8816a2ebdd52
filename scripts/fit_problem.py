"""Two-nu step decomposition for any problem (same process)."""

import os
import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    Ode1D,
    Poisson3D,
    SolverConfig,
)

PROBS = {"poisson3d": Poisson3D, "ode1d": Ode1D, "lyapunov2d": Lyapunov2D}


def run(prob_name, n, nu, reps, **cy):
    cy.setdefault("coarsest", os.environ.get("AB_COARSEST", "relax"))
    nl = int(os.environ.get("AB_NUM_LEVELS", "0")) or None
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, **cy),
        backend="auto",
        num_levels=nl,
        precision=os.environ.get("AB_PRECISION", "f32"),
    )
    solver = MultigridSolver(PROBS[prob_name](), n, cfg)
    program = solver.program

    def step(levels):
        out = program.solve_step(levels)
        l2, _ = program.residual_norms(out)
        return out, l2

    stepc = jax.jit(step, donate_argnums=0)
    levels = solver.fresh_levels()
    t0 = time.perf_counter()
    c = stepc.lower(levels).compile()
    print(f"  compile {time.perf_counter() - t0:.0f}s", flush=True)
    levels, l2 = c(levels)
    float(l2)
    lv = levels
    t0 = time.perf_counter()
    for _ in range(reps):
        lv, l2 = c(lv)
    r = float(l2)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{prob_name} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    prob = sys.argv[1]
    n = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    lo, hi = 40, 100
    t_lo = run(prob, n, lo, reps)
    t_hi = run(prob, n, hi, reps)
    slope = (t_hi - t_lo) / (hi - lo)
    print(
        f"fixed={1e3 * (t_lo - slope * lo):.2f} ms "
        f"slope={1e6 * slope:.1f} us/nu-unit",
        flush=True,
    )

"""In-process interleaved A/B for SPLIT2D_MIN_Y2 (the half-width at
which the 2D color-split slab kernel engages) at fixed SPLIT2D_T, on
the lyapunov2d bench config.  MIN_Y2=256 pulls 513^2-class levels onto
the split kernel; 512 leaves them on the dense slab.

Usage:  python scripts/ab_split2d_min_y2.py [n] [reps] [min_y2 values...]
"""

import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)
from pde_multigrid_tpu.ops.pallas import relax as relax_mod


def run(n, nu, reps, min_y2):
    relax_mod.SPLIT2D_MIN_Y2 = min_y2
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, coarsest="exact"),
        backend="auto",
    )
    solver = MultigridSolver(Lyapunov2D(), n, cfg)
    program = solver.program

    def step(levels):
        out = program.solve_step(levels)
        l2, _ = program.residual_norms(out)
        return out, l2

    stepc = jax.jit(step, donate_argnums=0)
    levels = solver.fresh_levels()
    t0 = time.perf_counter()
    c = stepc.lower(levels).compile()
    print(
        f"  min_y2={min_y2} nu={nu} compile {time.perf_counter() - t0:.0f}s",
        flush=True,
    )
    levels, l2 = c(levels)
    float(l2)
    lv = levels
    t0 = time.perf_counter()
    for _ in range(reps):
        lv, l2 = c(lv)
    r = float(l2)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"min_y2={min_y2} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ys = [int(a) for a in sys.argv[3:]] or [512, 256]
    nu = 100
    acc = {y: [] for y in ys}
    for _round in range(2):
        for y in ys:
            acc[y].append(run(n, nu, reps, y))
    for y in ys:
        runs = " / ".join(f"{t * 1e3:.2f}" for t in acc[y])
        print(
            f"min_y2={y}: {runs} ms (best {min(acc[y]) * 1e3:.2f})",
            flush=True,
        )

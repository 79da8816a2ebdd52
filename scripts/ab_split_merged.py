"""In-process interleaved A/B of subtree.SPLIT_MERGED (color-split
in-kernel sweeps for merged fused-kernel levels) at the bench config."""

import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson3D,
    SolverConfig,
)
from pde_multigrid_tpu.ops.pallas import subtree


def run(n, nu, reps, flag):
    subtree.SPLIT_MERGED = flag
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu),
        backend="auto",
        precision="mixed",
    )
    solver = MultigridSolver(Poisson3D(), n, cfg)
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
        f"split_merged={flag} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    nu = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    a1 = run(n, nu, reps, True)
    b1 = run(n, nu, reps, False)
    a2 = run(n, nu, reps, True)
    b2 = run(n, nu, reps, False)
    print(
        f"ON {min(a1, a2) * 1e3:.2f} ms  OFF {min(b1, b2) * 1e3:.2f} ms  "
        f"deltas {(b1 - a1) * 1e3:+.2f} / {(b2 - a2) * 1e3:+.2f} ms",
        flush=True,
    )

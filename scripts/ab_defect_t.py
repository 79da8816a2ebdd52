"""In-process interleaved A/B of DEFECT_T (bf16 inner sweeps per HBM
round trip) at the bench config with precision='mixed'."""

import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson3D,
    SolverConfig,
)
from pde_multigrid_tpu.ops.pallas import defect


def run(n, nu, reps, t):
    defect.DEFECT_T = t
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
        f"T={t} n={n} nu={nu} per_step={dt * 1e3:.2f} ms res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    nu = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    ts = [int(x) for x in (sys.argv[4].split(",") if len(sys.argv) > 4 else ["1", "2", "4"])]
    first = {}
    for t in ts:
        first[t] = run(n, nu, reps, t)
    second = {}
    for t in ts:
        second[t] = run(n, nu, reps, t)
    for t in ts:
        print(
            f"T={t}: {first[t] * 1e3:.2f} / {second[t] * 1e3:.2f} ms "
            f"(best {min(first[t], second[t]) * 1e3:.2f})",
            flush=True,
        )

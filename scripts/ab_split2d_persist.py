"""In-process interleaved A/B: persistent color-split 2D tier
(PDE_MG_SPLIT2D_PERSIST; ops/split2d.py — relax legs, residual+restrict
and prolong+blend all in half layout, zero dense<->split conversions
inside a cycle visit) vs the per-leg-converting split slab tier.

Usage:  python scripts/ab_split2d_persist.py [n] [reps]
Two-nu fits per mode separate fixed cost from per-sweep slope.
"""

import os
import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)


def run(n, nu, reps, persist):
    os.environ["PDE_MG_SPLIT2D_PERSIST"] = "1" if persist else "0"
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
        f"  persist={persist} nu={nu} compile "
        f"{time.perf_counter() - t0:.0f}s",
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
        f"persist={persist} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    lo, hi = 40, 100
    acc = {m: [] for m in (False, True)}
    for _round in range(2):
        for m in (False, True):
            t_lo = run(n, lo, reps, m)
            t_hi = run(n, hi, reps, m)
            slope = (t_hi - t_lo) / (hi - lo)
            fixed = t_lo - slope * lo
            acc[m].append((fixed, slope))
            print(
                f"  -> persist={m}: fixed={fixed * 1e3:.2f} ms "
                f"slope={slope * 1e6:.1f} us/nu",
                flush=True,
            )
    for m, rows in acc.items():
        fx = sum(r[0] for r in rows) / len(rows)
        sl = sum(r[1] for r in rows) / len(rows)
        print(
            f"SUMMARY persist={m}: fixed={fx * 1e3:.2f} ms "
            f"slope={sl * 1e6:.1f} us/nu"
        )

"""In-process interleaved A/B for the 2D split-slab knobs at the
lyapunov2d bench config: T (sweeps per HBM round trip, module var
relax.SPLIT2D_T) with the new one-sided halo and f_zero RHS dropping.

Usage:  python scripts/ab_split2d_t.py [n] [reps] [T values...]
Within-process comparison only (shared TPU pool).  Two-nu fits per T
separate fixed cost from per-sweep slope.
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
from pde_multigrid_tpu.ops.pallas import relax as relax_mod


def run(n, nu, reps, t_val):
    relax_mod.SPLIT2D_T = t_val
    # optional: also override the split-kernel engagement size (e.g.
    # AB_MIN_Y2=256 pulls 513^2-class levels off the dense slab tier)
    my2 = os.environ.get("AB_MIN_Y2")
    if my2:
        relax_mod.SPLIT2D_MIN_Y2 = int(my2)
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
    print(f"  T={t_val} nu={nu} compile {time.perf_counter() - t0:.0f}s",
          flush=True)
    levels, l2 = c(levels)
    float(l2)
    lv = levels
    t0 = time.perf_counter()
    for _ in range(reps):
        lv, l2 = c(lv)
    r = float(l2)
    dt = (time.perf_counter() - t0) / reps
    print(
        f"T={t_val} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ts = [int(a) for a in sys.argv[3:]] or [4, 8]
    lo, hi = 40, 100
    # interleave: lo/hi for each T, twice (A/B/A/B re-anchoring)
    acc = {t: [] for t in ts}
    for _round in range(2):
        for t in ts:
            t_lo = run(n, lo, reps, t)
            t_hi = run(n, hi, reps, t)
            slope = (t_hi - t_lo) / (hi - lo)
            fixed = t_lo - slope * lo
            acc[t].append((fixed, slope))
            print(
                f"  -> T={t} fixed={1e3 * fixed:.2f} ms "
                f"slope={1e6 * slope:.1f} us/nu-unit",
                flush=True,
            )
    for t in ts:
        fx = sum(a[0] for a in acc[t]) / len(acc[t])
        sl = sum(a[1] for a in acc[t]) / len(acc[t])
        print(
            f"T={t} MEAN fixed={1e3 * fx:.2f} ms "
            f"slope={1e6 * sl:.1f} us/nu-unit",
            flush=True,
        )

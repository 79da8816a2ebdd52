"""In-process interleaved A/B: HJB color-split tier at 1025^2/2049^2
(PDE_MG_HJB_SPLIT2D; VERDICT r4 #8 / KERNELS.md HJB-split follow-up:
the tier lost at 513^2 where its two-sided trapezoid halos eat ~1.5x
redundant compute — the halo share halves at every size doubling).

Usage:  python scripts/ab_hjb_split_1025.py [n] [reps] [nu]
"""

import os
import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    HJBMinTime,
    MultigridSolver,
    SolverConfig,
)


def run(n, nu, reps, split):
    os.environ["PDE_MG_HJB_SPLIT2D"] = "1" if split else "0"
    prob = HJBMinTime()  # reads the env in __init__
    cfg = SolverConfig(
        cycle=CycleConfig(
            "fmg", 2, nu, nu, coarsest="relax", scheme="fas"
        ),
        backend="auto",
    )
    solver = MultigridSolver(prob, n, cfg)
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
        f"  split={split} nu={nu} compile {time.perf_counter() - t0:.0f}s",
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
        f"split={split} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    nu_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    lo = max(4, nu_hi // 4)
    acc = {m: [] for m in (False, True)}
    for _round in range(2):
        for m in (False, True):
            t_lo = run(n, lo, reps, m)
            t_hi = run(n, nu_hi, reps, m)
            slope = (t_hi - t_lo) / (nu_hi - lo)
            fixed = t_lo - slope * lo
            acc[m].append((fixed, slope))
            print(
                f"  -> split={m}: fixed={fixed * 1e3:.2f} ms "
                f"slope={slope * 1e6:.1f} us/nu",
                flush=True,
            )
    for m, rows in acc.items():
        fx = sum(r[0] for r in rows) / len(rows)
        sl = sum(r[1] for r in rows) / len(rows)
        print(
            f"SUMMARY split={m}: fixed={fx * 1e3:.2f} ms "
            f"slope={sl * 1e6:.1f} us/nu"
        )

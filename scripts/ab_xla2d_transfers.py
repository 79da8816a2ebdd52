"""In-process interleaved A/B: 2D XLA MXU pick-matrix transfers
(PDE_MG_XLA2D_MIN_Y; transfer.make_xla_restrict_2d/_prolong_2d) vs the
jnp transfer tier at the lyapunov2d bench configs.

Usage:  python scripts/ab_xla2d_transfers.py [n] [reps] [problem]
Two-nu fits per mode separate fixed cost (where transfers live) from
per-sweep slope (shared TPU pool; CLAUDE.md measurement protocol).
"""

import os
import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    HJBMinTime,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)

PROBS = {"lyapunov2d": Lyapunov2D, "hjb2d": HJBMinTime}


def run(prob_name, n, nu, reps, xla2d):
    os.environ["PDE_MG_XLA2D_MIN_Y"] = "256" if xla2d else "0"
    prob = PROBS[prob_name]()
    nonlinear = getattr(prob, "nonlinear", False)
    cfg = SolverConfig(
        cycle=CycleConfig(
            "fmg", 2, nu, nu,
            coarsest="relax" if nonlinear else "exact",
            scheme="fas" if nonlinear else "cs",
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
        f"  xla2d={xla2d} nu={nu} compile {time.perf_counter() - t0:.0f}s",
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
        f"xla2d={xla2d} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    prob = sys.argv[3] if len(sys.argv) > 3 else "lyapunov2d"
    lo, hi = 40, 100
    acc = {m: [] for m in (False, True)}
    for _round in range(2):
        for m in (False, True):
            t_lo = run(prob, n, lo, reps, m)
            t_hi = run(prob, n, hi, reps, m)
            slope = (t_hi - t_lo) / (hi - lo)
            fixed = t_lo - slope * lo
            acc[m].append((fixed, slope))
            print(
                f"  -> xla2d={m}: fixed={fixed * 1e3:.2f} ms "
                f"slope={slope * 1e6:.1f} us/nu",
                flush=True,
            )
    for m, rows in acc.items():
        fx = sum(r[0] for r in rows) / len(rows)
        sl = sum(r[1] for r in rows) / len(rows)
        print(
            f"SUMMARY xla2d={m}: fixed={fx * 1e3:.2f} ms "
            f"slope={sl * 1e6:.1f} us/nu"
        )

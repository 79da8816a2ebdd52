"""In-process interleaved A/B: precision='mixed' (bf16 defect-correction
smoothing) vs 'f32' at the bench config.  Within-process comparison only
— the shared TPU pool's speed varies wildly between processes."""

import os
import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson3D,
    SolverConfig,
)


def run(n, nu, reps, precision):
    cfg = SolverConfig(
        cycle=CycleConfig(
            "fmg", 2, nu, nu,
            coarsest=os.environ.get("AB_COARSEST", "relax"),
        ),
        backend="auto",
        precision=precision,
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
        f"precision={precision} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


def fit(n, reps):
    """Two-nu decomposition per precision, same process: step(nu) =
    fixed + slope*nu isolates sweep cost from per-leg/fixed overheads."""
    out = {}
    for prec in ("mixed", "f32"):
        t_lo = run(n, 40, reps, prec)
        t_hi = run(n, 100, reps, prec)
        slope = (t_hi - t_lo) / 60
        fixed = t_lo - slope * 40
        out[prec] = (fixed, slope)
        print(
            f"{prec}: fixed={fixed * 1e3:.2f} ms  "
            f"slope={slope * 1e6:.1f} us/nu-unit",
            flush=True,
        )
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    nu = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    if len(sys.argv) > 4 and sys.argv[4] == "fit":
        fit(n, reps)
        sys.exit(0)
    m1 = run(n, nu, reps, "mixed")
    f1 = run(n, nu, reps, "f32")
    m2 = run(n, nu, reps, "mixed")
    f2 = run(n, nu, reps, "f32")
    print(
        f"MIXED {min(m1, m2) * 1e3:.2f} ms  F32 {min(f1, f2) * 1e3:.2f} ms  "
        f"deltas {(f1 - m1) * 1e3:+.2f} / {(f2 - m2) * 1e3:+.2f} ms",
        flush=True,
    )

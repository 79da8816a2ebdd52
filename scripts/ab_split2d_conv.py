"""In-process interleaved A/B: pallas MXU 2D color converters
(PDE_MG_SPLIT2D_CONV_KERNEL; relax.make_color_converters_2d) vs the
XLA reshape+select path, full lyapunov2d FMG step.

The conversions are per-LEG FIXED cost, so the A/B compares whole
steps at moderate nu (where fixed dominates) and at high nu.

Usage:  python scripts/ab_split2d_conv.py [n] [reps]
"""

import subprocess
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

probe = (
    "import jax, jax.numpy as jnp; "
    "a = jnp.ones((128, 128)); print('ok', float((a @ a)[0, 0]))"
)
for attempt in range(6):
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe], timeout=75,
            capture_output=True, text=True,
        )
        if "ok" in r.stdout:
            break
    except subprocess.TimeoutExpired:
        pass
    print(f"[probe] attempt {attempt+1} hung; retrying", flush=True)


def run(n, nu, reps, kernel_conv):
    relax_mod.SPLIT2D_CONV_KERNEL = bool(kernel_conv)
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
        f"  conv_kernel={kernel_conv} nu={nu} compile "
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
        f"conv_kernel={kernel_conv} n={n} nu={nu} "
        f"per_step={dt * 1e3:.2f} ms res_l2={r:.3e}",
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
                f"  -> conv_kernel={m}: fixed={fixed * 1e3:.2f} ms "
                f"slope={slope * 1e6:.1f} us/nu",
                flush=True,
            )
    for m, rows in acc.items():
        fx = sum(r[0] for r in rows) / len(rows)
        sl = sum(r[1] for r in rows) / len(rows)
        print(
            f"SUMMARY conv_kernel={m}: fixed={fx * 1e3:.2f} ms "
            f"slope={sl * 1e6:.1f} us/nu"
        )

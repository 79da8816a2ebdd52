"""In-process interleaved A/B: split-2D compile-service window cap
(relax.SPLIT2D_MAX_WINDOW) at the lyapunov2d thesis config.

RESULT (2026-08-21): the 680 KB default is a REAL scoped-VMEM
boundary, not a service outage.  Uncapped (1088K), the ladder picks
(128,T16)@2049² = 720K, whose compiled VMEM stack is 16.06M against
the 16.00M scoped limit — the service now reports the true OOM that
its chipless-AOT fallback masked behind HTTP 500s on 2026-08-20.
Compiled footprint ≈ 22.8 bytes per window byte (double-buffered
copies of the ~12 modeled streams); feasible boundary ≈ 713K.  Keep
this harness for re-probing if the kernel's buffering is ever reduced.

Usage: python scripts/ab_split2d_window.py [n] [reps] [cap_kb...]
"""

import signal
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


def run(n, nu, reps, cap_kb, compile_deadline=240):
    relax_mod.SPLIT2D_MAX_WINDOW = cap_kb * 1024
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

    def on_alarm(signum, frame):
        raise TimeoutError(f"compile exceeded {compile_deadline}s")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(compile_deadline)
    t0 = time.perf_counter()
    try:
        c = stepc.lower(levels).compile()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    print(
        f"  cap={cap_kb}K nu={nu} compile "
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
        f"cap={cap_kb}K n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4097
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    caps = [int(a) for a in sys.argv[3:]] or [680, 1088]
    # print the ladder pick per cap before burning any compile time
    solver_geom = None
    for cap in caps:
        relax_mod.SPLIT2D_MAX_WINDOW = cap * 1024
        pad = -(-n // 128) * 128
        pick = relax_mod.split2d_plan((n - 1, pad), x_offsets=(+1,))
        print(f"cap={cap}K ladder pick (B, T, ext) = {pick}", flush=True)
    lo, hi = 40, 100
    acc = {c: [] for c in caps}
    for _round in range(2):
        for cap in caps:
            try:
                t_lo = run(n, lo, reps, cap)
                t_hi = run(n, hi, reps, cap)
            except Exception as e:  # noqa: BLE001 — a failing arm
                # (compile OOM / HTTP 500 / deadline) costs one probe
                print(
                    f"cap={cap}K FAILED: {str(e)[:300]}", flush=True
                )
                continue
            slope = (t_hi - t_lo) / (hi - lo)
            fixed = t_lo - slope * lo
            acc[cap].append((fixed, slope))
            print(
                f"  -> cap={cap}K fixed={1e3 * fixed:.2f} ms "
                f"slope={1e6 * slope:.1f} us/nu-unit",
                flush=True,
            )
    for cap, rows in acc.items():
        if not rows:
            continue
        fx = sum(a[0] for a in rows) / len(rows)
        sl = sum(a[1] for a in rows) / len(rows)
        print(
            f"cap={cap}K MEAN fixed={1e3 * fx:.2f} ms "
            f"slope={1e6 * sl:.1f} us/nu-unit",
            flush=True,
        )

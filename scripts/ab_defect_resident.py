"""In-process interleaved A/B of the ALL-sweeps-resident defect inner
smoother (PDE_MG_DEFECT_RESIDENT) vs the T-chunked slab inner at the
bench config with precision='mixed'.  Also asserts both variants land on
the same residual (bf16-level phase-boundary quantization differences
only; the gate is a perf question)."""

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


def run(n, nu, reps, resident):
    os.environ["PDE_MG_DEFECT_RESIDENT"] = "1" if resident else "0"
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, coarsest="exact"),
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
        f"resident={int(resident)} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt, r


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    nu = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    first = {v: run(n, nu, reps, v) for v in (False, True)}
    second = {v: run(n, nu, reps, v) for v in (False, True)}
    for v in (False, True):
        print(
            f"resident={int(v)}: {first[v][0] * 1e3:.2f} / "
            f"{second[v][0] * 1e3:.2f} ms "
            f"(best {min(first[v][0], second[v][0]) * 1e3:.2f}) "
            f"res {first[v][1]:.3e}",
            flush=True,
        )
    ra, rb = first[False][1], first[True][1]
    rel = abs(ra - rb) / max(abs(ra), 1e-30)
    print(f"residual match: rel diff {rel:.2e}", flush=True)
    assert rel < 0.05, "resident variant changed the converged residual"

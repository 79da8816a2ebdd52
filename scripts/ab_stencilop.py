"""In-process interleaved A/B: resident stencil-operator kernel
(ops/pallas/stencilop.py) vs the jnp Galerkin tier, varcoef2d FMG.

Usage:  python scripts/ab_stencilop.py [n] [nu] [reps]
"""

import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    SolverConfig,
    VariableCoefficientPoisson,
)


def run(n, nu, reps, backend):
    cfg = SolverConfig(
        cycle=CycleConfig(
            "fmg", 2, nu, nu, coarse_operator="galerkin"
        ),
        backend=backend,
    )
    solver = MultigridSolver(VariableCoefficientPoisson(2), n, cfg)
    program = solver.program
    if backend != "jnp":
        engaged = [
            l
            for l, fn in enumerate(program.kernels._relax_fns)
            if fn is not None
        ]
        print(f"  stencilop engaged on levels {engaged}", flush=True)

    def step(levels):
        out = program.solve_step(levels)
        l2, _ = program.residual_norms(out)
        return out, l2

    stepc = jax.jit(step, donate_argnums=0)
    levels = solver.fresh_levels()
    t0 = time.perf_counter()
    c = stepc.lower(levels).compile()
    print(
        f"  backend={backend} nu={nu} compile "
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
        f"backend={backend} n={n} nu={nu} per_step={dt * 1e3:.2f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 257
    nu = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    acc = {m: [] for m in ("jnp", "auto")}
    for _round in range(2):
        for m in ("jnp", "auto"):
            acc[m].append(run(n, nu, reps, m))
    for m, ts in acc.items():
        best = min(ts)
        print(f"SUMMARY backend={m}: best per_step={best * 1e3:.2f} ms")

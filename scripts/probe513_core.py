"""513^3 non-relax core: time the FMG step with nu1=nu2=0 (relax legs
and their conversions vanish — cycles.CycleProgram._relax early-outs),
leaving transfers + coarse solves + zero-sets + bench diagnostics.

bench.py can't express this (--nu 0 means "per-problem default"), so
this one-off uses the same unroll-chain methodology.

Usage: PYTHONPATH=... python scripts/probe513_core.py [N] [reps]
"""

import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson3D,
    SolverConfig,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 513
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

probe = (
    "import jax, jax.numpy as jnp; "
    "a = jnp.ones((128, 128)); print('ok', float((a @ a)[0, 0]))"
)
for attempt in range(6):
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=75,
            capture_output=True,
            text=True,
        )
        if "ok" in r.stdout:
            break
    except subprocess.TimeoutExpired:
        pass
    print(f"[probe] attempt {attempt+1} hung; retrying", flush=True)

cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, 0, 0, coarsest="exact"),
    backend="auto",
    precision="mixed",
)
solver = MultigridSolver(Poisson3D(), N, cfg)
prog = solver.program
geo = solver.geoms[0]


def bench_step(levels):
    out = prog.solve_step(levels)
    l2, _ = prog.residual_norms(out)
    fin = out[0]
    exact = solver.problem.exact_solution(geo.coords(fin.v.dtype))
    diff = (fin.v - exact) * fin.aux["m_int"]
    return out, l2, jnp.max(jnp.abs(diff))


K = 4


def chained_k(lv):
    out = bench_step(lv)
    for _ in range(K - 1):
        out = bench_step(out[0])
    return out


t0 = time.perf_counter()
lv = solver.fresh_levels()
compiled = jax.jit(chained_k, donate_argnums=0).lower(lv).compile()
print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
lv2, l2, _ = compiled(lv)
float(l2)
reps_eff = max(1, REPS // K)
for _pass in range(2):
    t0 = time.perf_counter()
    for _ in range(reps_eff):
        lv2, l2, err = compiled(lv2)
    float(l2)
    dt = time.perf_counter() - t0
    print(
        f"pass: {dt:.3f}s = {dt/(reps_eff*K)*1e3:.1f} ms/step (nu=0 core)",
        flush=True,
    )

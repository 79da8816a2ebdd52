"""Decompose the ode1d per-step FIXED cost by hierarchy depth.

The bench two-nu fit (round 4) pins ode1d n=8193 at fixed 1.42 ms/step
vs a ~0.9 ms finest-relax slope share — the fixed cost IS the step at
the thesis config.  Sweep the hierarchy depth (num_levels) at fixed nu
in ONE process, chaining reps in-jit (a fori of steps — no per-rep
tunnel dispatch), to attribute it: the depth slope is the per-coarse-
level cost (per-level pallas dispatch + transfers), the depth-2
intercept is finest relax + residual + top transfers.

Usage: python scripts/profile_ode1d_depth.py [n] [nu] [reps] [depths..]
"""

import sys
import time

import jax
import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Ode1D,
    SolverConfig,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8193
NU = int(sys.argv[2]) if len(sys.argv) > 2 else 100
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
DEPTHS = [int(a) for a in sys.argv[4:]] or [2, 3, 5, 8, 12]


def run(depth):
    cfg = SolverConfig(
        # relax coarsest: shallow truncations leave a too-large level
        # for a direct solve, and the decomposition only needs a
        # consistent coarsest treatment across depths
        cycle=CycleConfig("fmg", 2, NU, NU, coarsest="relax"),
        backend="auto",
        num_levels=depth,
    )
    solver = MultigridSolver(Ode1D(), N, cfg)
    program = solver.program

    def chain(levels):
        def body(_, lv):
            return program.solve_step(lv)

        out = jax.lax.fori_loop(0, REPS, body, levels)
        l2, _ = program.residual_norms(out)
        return out, l2

    c = jax.jit(chain, donate_argnums=0).lower(
        solver.fresh_levels()
    ).compile()
    lv, l2 = c(solver.fresh_levels())
    float(l2)
    t0 = time.perf_counter()
    lv, l2 = c(lv)
    r = float(l2)
    dt = (time.perf_counter() - t0) / REPS
    print(
        f"depth={depth:2d} per_step={dt * 1e3:.3f} ms "
        f"res_l2={r:.3e}",
        flush=True,
    )
    return dt


acc = {}
for _round in range(2):
    for d in DEPTHS:
        acc.setdefault(d, []).append(run(d))
xs = sorted(acc)
ys = [min(acc[d]) for d in xs]
if len(xs) >= 2:
    import numpy as np

    a, b = np.polyfit(xs, ys, 1)
    print(
        f"fit: {a * 1e3:.3f} ms per extra level, "
        f"intercept {b * 1e3:.3f} ms (best-of-2 per depth)",
        flush=True,
    )

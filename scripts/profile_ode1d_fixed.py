"""Attribute the ode1d bench-config FIXED cost (~1.4 ms/step).

The bench hierarchy is depth 3 (8193 -> 4097 -> 2049-dense-inverse).
Chained in-jit steps at tiny nu make per_step ~= fixed; comparing
  (a) full FMG step at nu=2            (everything)
  (b) full FMG step at nu=2, depth 2   (no L1 V-chain, exact at 4097? no
      — dense probe caps at 2048 interior, so depth 2 runs coarsest
      relax instead; still separates the L1/L2 chain share)
  (c) pure L0 relax leg (one pallas call)
gives the split between per-dispatch overhead and the coarse chain.

Usage: python scripts/profile_ode1d_fixed.py [n] [reps]
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
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def chain_time(nu, num_levels, coarsest, label):
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, coarsest=coarsest),
        backend="auto",
        num_levels=num_levels,
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
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        lv, l2 = c(lv)
        float(l2)
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} per_step={best * 1e6:8.1f} us", flush=True)
    return best


def relax_only_time(nu):
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.ops.pallas import relax as R

    h = Hierarchy.build(Ode1D(), N, pad_last_to=128)
    geom = h.geoms[0]
    lvl = h.levels[0]
    import numpy as np

    rng = np.random.default_rng(0)
    v0 = jnp.asarray(
        rng.standard_normal(geom.padded_shape), jnp.float32
    ) * lvl.aux["m_int"]
    f = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)
    fn = R.make_split_resident_relax_1d(Ode1D(), geom, jnp.float32)

    def chain(v):
        def body(_, vv):
            return fn(vv, f, nu)

        out = jax.lax.fori_loop(0, REPS, body, v)
        return out, jnp.sum(out)

    c = jax.jit(chain).lower(v0).compile()
    out, s = c(v0)
    float(s)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out, s = c(v0)
        float(s)
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(
        f"pure L0 relax call (nu={nu})        "
        f"per_step={best * 1e6:8.1f} us",
        flush=True,
    )
    return best


for _round in range(2):
    chain_time(2, None, "exact", "fmg depth3 exact nu=2")
    chain_time(2, 2, "relax", "fmg depth2 relax-coarsest nu=2")
    chain_time(2, 3, "relax", "fmg depth3 relax-coarsest nu=2")
    relax_only_time(2)
    relax_only_time(1000)

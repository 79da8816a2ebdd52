"""In-process interleaved A/B of the resident defect inner's iterate
dtype (f32 vs bf16) plus the chunked slab inner, measured as the relax
LEG per-sweep slope at the 129^3 bench level (two-nu fit, min-of-k)."""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson3D,
    SolverConfig,
)
from pde_multigrid_tpu.ops.pallas import defect as D

N = int(sys.argv[1]) if len(sys.argv) > 1 else 129
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, 100, 100, coarsest="exact"),
    backend="auto",
    precision="mixed",
)
solver = MultigridSolver(Poisson3D(), N, cfg)
levels = solver.fresh_levels()
L0 = levels[0]
g0 = solver.geoms[0]
v, f = L0.v, L0.f

VARIANTS = {
    "resident_f32": {"PDE_MG_DEFECT_RESIDENT": "1",
                     "PDE_MG_DEFECT_RESIDENT_F32": "1"},
    "resident_bf16": {"PDE_MG_DEFECT_RESIDENT": "1",
                      "PDE_MG_DEFECT_RESIDENT_F32": "0"},
    "chunked": {"PDE_MG_DEFECT_RESIDENT": "0"},
}


def build(envs):
    os.environ.update(envs)
    fn = D.plan_defect_relax(solver.problem, g0, jnp.float32)
    assert fn is not None

    def chain(nu):
        return jax.jit(
            lambda n: lax.fori_loop(
                0, n, lambda i, vv: fn(vv, f, nu), v
            )[1, 1, 1]
        )

    return chain


def measure(chain, nu, n1, n2, k):
    c = chain(nu)
    float(c(n1))
    ts = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            float(c(n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n2] - ts[n1]) / (n2 - n1)


chains = {name: build(envs) for name, envs in VARIANTS.items()}
for rnd in range(2):
    for name, chain in chains.items():
        m4 = measure(chain, 4, 2, 22, REPS)
        m100 = measure(chain, 100, 2, 8, REPS)
        sweep = (m100 - m4) / 96
        print(
            f"[{rnd}] {name}: leg nu=100 {m100*1e3:.3f} ms, "
            f"per-sweep {sweep*1e6:.2f} us, fixed {(m4-4*sweep)*1e3:.3f} ms",
            flush=True,
        )

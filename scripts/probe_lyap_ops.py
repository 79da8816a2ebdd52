"""Chained per-op timing of the 2D lyapunov level-0 building blocks on
TPU: residual, restrict, prolong+correct, and one relax leg — to find
where the 166 ms fixed cost lives."""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)
from pde_multigrid_tpu.ops import stencil


def chain(tag, step, x0, K=16, reps=5):
    c = jax.jit(
        lambda x: lax.fori_loop(0, K, lambda i, xx: step(xx), x)
    ).lower(x0).compile()
    out = c(x0)
    float(out.reshape(-1)[7])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(out)
    float(out.reshape(-1)[7])
    dt = (time.perf_counter() - t0) / (reps * K)
    print(f"{tag}: {dt * 1e6:.0f} us", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    cfg = SolverConfig(cycle=CycleConfig("fmg", 2, 40, 40), backend="auto")
    s = MultigridSolver(Lyapunov2D(), n, cfg)
    k = s.program.kernels
    lv = s.fresh_levels()
    l0, l1 = lv[0], lv[1]
    g0 = s.geoms[0]
    v, f = l0.v, l0.f

    chain("residual L0", lambda x: k.residual(0, x, f, l0.aux), v)
    r0 = jax.jit(lambda: k.residual(0, v, f, l0.aux))()
    chain(
        "restrict L0->L1",
        lambda x: k.restrict(0, x, l1.aux["m_int"], l1.aux["m_log"])
        .astype(jnp.float32)
        .sum()
        * 0
        + x,
        r0,
    )
    chain(
        "prolong L1->L0 + correct",
        lambda x: stencil.apply_correction(
            x, k.prolong(0, l1.v), l0.aux["m_int"]
        ),
        v,
    )
    chain("relax L0 (1 sweep)", lambda x: k.relax(0, x, f, l0.aux, 1), v)
    chain("relax L0 (8 sweeps)", lambda x: k.relax(0, x, f, l0.aux, 8), v, K=4)


if __name__ == "__main__":
    main()

"""Cost of XLA color split/merge at sub-lane coarse levels, and
subtree V-cycle cost rooted at L2 (64^3), on TPU.  Long chains so the
tiny ops rise above tunnel noise."""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import CycleConfig, MultigridSolver, Poisson3D, SolverConfig
from pde_multigrid_tpu.ops.pallas import relax as R

N, NU = 257, 20
cfg = SolverConfig(cycle=CycleConfig("fmg", 2, NU, NU), backend="auto")
solver = MultigridSolver(Poisson3D(), N, cfg)
prog = solver.program
ker = prog.kernels
levels = solver.fresh_levels()
print(f"levels: {[g.padded_shape for g in solver.geoms]}", flush=True)


def marginal(fn, n1, n2):
    float(fn(n1))
    t = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        float(fn(n))
        t[n] = time.perf_counter() - t0
    return (t[n2] - t[n1]) / (n2 - n1), t[n2]


# anchor
v0 = levels[0].v
eps_j = jax.jit(
    lambda n: lax.fori_loop(
        0, n, lambda i, vv: vv + vv[1, 1, 1] * jnp.float32(1e-30), v0
    )[1, 1, 1]
)
m0, _ = marginal(eps_j, 2, 8)
print(f"anchor L0 pass: {m0*1e6:.1f} us (roofline ~164)", flush=True)

# XLA converter pair per level (the split_colors/merge_colors used by
# split_merged coarse kernels)
for l in range(2, 7):
    geom = solver.geoms[l]
    shape = geom.padded_shape
    v = levels[l].v
    qb = R._split_qmask(shape[0], shape[2])

    def pair(vv, qb=qb):
        r, b = R.split_colors(vv, qb)
        return R.merge_colors(r, b, qb)

    idx = (1, 1, 1)
    j = jax.jit(
        lambda n, p=pair, vv=v: lax.fori_loop(0, n, lambda i, x: p(x), vv)[idx]
    )
    m, tmax = marginal(j, 64, 256)
    print(
        f"L{l} {str(shape):>15s} XLA split+merge pair: {m*1e6:8.2f} us"
        f"  (t256={tmax*1e3:.1f} ms)",
        flush=True,
    )

# relax-call marginal at coarse levels with long chains
for l in range(2, 7):
    lvl = levels[l]
    fn = ker._relax_fns[l]
    f = lvl.f
    idx = tuple(min(1, s - 1) for s in lvl.v.shape)
    j = jax.jit(
        lambda n, r=fn, vv=lvl.v, ff=f: lax.fori_loop(
            0, n, lambda i, x: r(x, ff, NU), vv
        )[idx]
    )
    m, tmax = marginal(j, 16, 64)
    print(
        f"L{l} relax call(nu={NU}): {m*1e6:9.2f} us  (t64={tmax*1e3:.1f} ms)",
        flush=True,
    )

# subtree v-cycle rooted at L2
j = jax.jit(
    lambda n: lax.fori_loop(0, n, lambda i, lv: prog.v_cycle(lv, 2), levels)[
        2
    ].v[1, 1, 1]
)
m, tmax = marginal(j, 4, 16)
print(f"vcycle rooted L2 (64^3 subtree): {m*1e3:.3f} ms", flush=True)

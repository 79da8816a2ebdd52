"""Fixed-cost breakdown of the poisson3d 129^3 two-grid bench step:
the exact 65^3 fast-diagonalization solve, the fused residual+restrict
129->65, the fused prolong+blend 65->129, the defect path's rsplit/fold
pair, and the relax leg (per-sweep slope + per-leg fixed cost via a
two-nu fit).  Chained fori_loop marginals with min-of-k sampling to
cancel the ~30 ms tunnel dispatch noise.

Usage: python scripts/profile_fixed129.py [n]
"""

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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 129
cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, 100, 100, coarsest="exact"),
    backend="auto",
    precision="mixed",
)
solver = MultigridSolver(Poisson3D(), N, cfg)
prog = solver.program
ker = prog.kernels
levels = solver.fresh_levels()
nl = len(levels)
print(f"levels: {[g.padded_shape for g in solver.geoms]}", flush=True)
L0, L1, Lc = levels[0], levels[1], levels[-1]
v, f = L0.v, L0.f


def timed(name, fn, n1, n2, k=5):
    t0 = time.perf_counter()
    float(fn(n1))
    print(f"  [{name}] compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            float(fn(n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    marg = (ts[n2] - ts[n1]) / (n2 - n1)
    print(
        f"{name}: marginal {marg*1e3:.3f} ms"
        f"  (t{n1}={ts[n1]*1e3:.2f} ms, t{n2}={ts[n2]*1e3:.2f} ms)",
        flush=True,
    )
    return marg


def chain(step_fn, x0):
    return jax.jit(
        lambda n: lax.fori_loop(0, n, lambda i, vv: step_fn(vv), x0)[
            1, 1, 1
        ]
    )


# 1. exact coarse solve, chained via v-feedback
cs = prog._coarse_solve(nl - 1)
timed("exact_coarse", chain(lambda vv: cs(vv, Lc.f, Lc.aux), Lc.v), 2, 22)

# 2. fused residual+restrict L0 -> L1 (feed back via f32 epsilon)
def rr_step(vv):
    r = prog._fused("residual_restrict", 0, vv, f, L0.aux, L1.aux)
    return vv + jnp.float32(1e-30) * r[1, 1, 1]


timed("residual_restrict", chain(rr_step, v), 2, 12)

# 3. fused prolong+blend Lc -> L0 ("add" = coarse-grid correction)
def pb_step(vv):
    return prog._fused(
        "prolong_blend", 0, vv, L1.v, L0.aux["m_int"], "add"
    )


timed("prolong_blend", chain(pb_step, v), 2, 12)

# 4. defect-path fixed passes alone: rsplit (residual+split) and fold
from pde_multigrid_tpu.ops.pallas import defect as D

g0 = solver.geoms[0]
rsplit = D.make_residual_split(prog.problem, g0, jnp.float32, jnp.bfloat16)
fold = D.make_merge_fold(g0, jnp.bfloat16, jnp.float32)
if rsplit is not None:

    def rs_step(vv):
        rr, rb = rsplit(vv, f)
        return vv + jnp.float32(1e-30) * rr[1, 1, 1].astype(jnp.float32)

    timed("rsplit", chain(rs_step, v), 2, 12)
    rr0, rb0 = jax.jit(rsplit)(v, f)

    def fold_step(vv):
        return fold(rr0, rb0, vv)

    timed("fold", chain(fold_step, v), 2, 12)

# 5. relax leg at L0: two-nu fit separates per-sweep slope from fixed
margs = {}
for nu in (4, 100):
    margs[nu] = timed(
        f"L0_leg_nu{nu}",
        chain(lambda vv, nu=nu: ker.relax(0, vv, f, L0.aux, nu), v),
        2,
        8 if nu == 100 else 22,
    )
sweep = (margs[100] - margs[4]) / 96
print(
    f"  -> L0 per-sweep {sweep*1e6:.1f} us, per-leg fixed "
    f"{(margs[4] - 4*sweep)*1e3:.3f} ms  "
    f"(leg nu=100 total {margs[100]*1e3:.3f} ms)",
    flush=True,
)

# 6. the whole step for reference
stepc = jax.jit(
    lambda n: lax.fori_loop(
        0, n, lambda i, lv: prog.solve_step(lv), levels
    )[0].v[1, 1, 1]
)
timed("full_step", stepc, 1, 5)

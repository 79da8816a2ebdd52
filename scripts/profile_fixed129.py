"""Fixed-cost breakdown of the poisson3d 129^3 two-grid bench step:
the exact 65^3 fast-diagonalization solve (x3 per step: FMG cascade +
one per V-cycle), the fused residual+restrict 129->65, the fused
prolong+blend 65->129, and the defect path's per-leg rsplit/fold pair.
Chained-marginal harness (same as profile_lyap.py) to cancel tunnel
dispatch.

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
L0, Lc = levels[0], levels[-1]
v, f = L0.v, L0.f


def timed(name, fn, n1, n2):
    t0 = time.perf_counter()
    float(fn(n1))
    print(f"  [{name}] compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        float(fn(n))
        ts[n] = time.perf_counter() - t0
    marg = (ts[n2] - ts[n1]) / (n2 - n1)
    print(
        f"{name}: marginal {marg*1e3:.3f} ms"
        f"  (t{n1}={ts[n1]*1e3:.2f} ms, t{n2}={ts[n2]*1e3:.2f} ms)",
        flush=True,
    )
    return marg


# 1. exact coarse solve, chained via v-feedback
cs = prog._coarse_solve(nl - 1)
cs_j = jax.jit(
    lambda n: lax.fori_loop(
        0,
        n,
        lambda i, vv: cs(vv, Lc.f, Lc.aux),
        Lc.v,
    )[1, 1, 1]
)
timed("exact_coarse_65", cs_j, 2, 12)

# 2. fused residual+restrict L0 -> L1 (feed result back via f epsilon)
def rr_step(vv):
    r = prog._fused("residual_restrict", 0, vv, f, L0.aux, Lc.aux)
    return vv + jnp.float32(1e-30) * r[1, 1, 1]


timed(
    "residual_restrict_129",
    jax.jit(
        lambda n: lax.fori_loop(0, n, lambda i, vv: rr_step(vv), v)[1, 1, 1]
    ),
    2,
    10,
)

# 3. fused prolong+blend Lc -> L0
def pb_step(vv):
    out = prog._fused(
        "prolong_blend", 0, vv, Lc.v, L0.aux["m_int"], "correct"
    )
    return out


timed(
    "prolong_blend_65_129",
    jax.jit(
        lambda n: lax.fori_loop(0, n, lambda i, vv: pb_step(vv), v)[1, 1, 1]
    ),
    2,
    10,
)

# 4. one full relax leg at nu=1 vs nu=100 at L0 via the program's relax
def leg(nu):
    return jax.jit(
        lambda n: lax.fori_loop(
            0,
            n,
            lambda i, vv: prog._relax(0, vv, f, L0.aux, nu),
            v,
        )[1, 1, 1]
    )


m1 = timed("L0_leg_nu1", leg(1), 2, 8)
m100 = timed("L0_leg_nu100", leg(100), 2, 6)
sweep = (m100 - m1) / 99
print(
    f"  -> L0 per-sweep {sweep*1e6:.1f} us, per-leg fixed "
    f"{(m1 - sweep)*1e3:.3f} ms",
    flush=True,
)

# 5. the whole step for reference
def step(lv):
    out = prog.solve_step(lv)
    return out


stepc = jax.jit(
    lambda n: lax.fori_loop(
        0, n, lambda i, lv: step(lv), levels
    )[0].v[1, 1, 1]
)
timed("full_step", stepc, 1, 4)

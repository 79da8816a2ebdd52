"""Per-level relax marginal cost + per-level fixed overhead on TPU.

For each level l: time a dynamic-n chain of single sweeps (marginal =
per-sweep cost) and a chain of ns=NU relax calls (marginal = per-call
cost, revealing fixed per-call overhead vs NU * sweep).
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import CycleConfig, MultigridSolver, Poisson3D, SolverConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 257
NU = int(sys.argv[2]) if len(sys.argv) > 2 else 20

cfg = SolverConfig(cycle=CycleConfig("fmg", 2, NU, NU), backend="auto")
solver = MultigridSolver(Poisson3D(), N, cfg)
ker = solver.program.kernels
levels = solver.fresh_levels()
nlev = len(levels)
print(f"levels: {[g.padded_shape for g in solver.geoms]}", flush=True)


def marginal(fn, n1, n2):
    float(fn(n1))  # compile
    t = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        float(fn(n))
        t[n] = time.perf_counter() - t0
    return (t[n2] - t[n1]) / (n2 - n1)


# reference unit: one elementwise pass over L0 (anchors the throttle level)
v0 = levels[0].v
eps_j = jax.jit(
    lambda n: lax.fori_loop(
        0, n, lambda i, vv: vv + vv[1, 1, 1] * jnp.float32(1e-30), v0
    )[1, 1, 1]
)
m0 = marginal(eps_j, 2, 8)
print(f"L0 elementwise pass: {m0*1e6:.1f} us  (roofline ~164 us)", flush=True)

tot_sweeps = 0.0
tot_fixed = 0.0
for l in range(nlev):
    lvl = levels[l]
    v, f = lvl.v, lvl.f
    fn = ker._relax_fns[l]
    if fn is None:
        relax1 = lambda vv: ker.relax(l, vv, f, lvl.aux, 1)
        relaxN = lambda vv: ker.relax(l, vv, f, lvl.aux, NU)
        kind = "jnp"
    else:
        relax1 = lambda vv: fn(vv, f, 1)
        relaxN = lambda vv: fn(vv, f, NU)
        kind = "pallas"
    idx = (1,) * len(lvl.v.shape)
    sw_j = jax.jit(
        lambda n, r=relax1: lax.fori_loop(0, n, lambda i, vv: r(vv), v)[idx]
    )
    call_j = jax.jit(
        lambda n, r=relaxN: lax.fori_loop(0, n, lambda i, vv: r(vv), v)[idx]
    )
    m_sw = marginal(sw_j, 4, 16)
    m_call = marginal(call_j, 2, 6)
    fixed = m_call - NU * m_sw
    visits = 2 * (l + 1)  # nu0 * (#levels whose v-cycles reach l)
    sweeps_cost = visits * 2 * NU * m_sw
    fixed_cost = visits * 2 * max(fixed, 0)
    tot_sweeps += sweeps_cost
    tot_fixed += fixed_cost
    print(
        f"L{l} {str(solver.geoms[l].padded_shape):>18s} {kind:6s}"
        f" sweep={m_sw*1e6:8.1f} us  call({NU})={m_call*1e6:9.1f} us"
        f"  fixed/call={fixed*1e6:8.1f} us"
        f"  step-contrib: sweeps={sweeps_cost*1e3:6.2f} ms"
        f" fixed={fixed_cost*1e3:6.2f} ms",
        flush=True,
    )

print(
    f"\nTotal relax contribution/step: sweeps={tot_sweeps*1e3:.2f} ms"
    f" + per-call fixed={tot_fixed*1e3:.2f} ms"
    f"  (throttle anchor: {m0*1e6:.0f} us/pass)",
    flush=True,
)

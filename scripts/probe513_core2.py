"""Decompose the 513^3 nu=0 FMG core: which jnp-tier component eats it?

All probes are XLA-only (no pallas), so fori-loop chains compile fine
at 513^3 geometry.  Marginal = (t[n2]-t[n1])/(n2-n1) cancels dispatch.

Usage: PYTHONPATH=... python scripts/probe513_core2.py [N]
"""

import subprocess
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
from pde_multigrid_tpu.ops import stencil

N = int(sys.argv[1]) if len(sys.argv) > 1 else 513

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
ker = prog.kernels
geo = solver.geoms[0]
levels = solver.fresh_levels()
L0, L1 = levels[0], levels[1]
v, f = L0.v, L0.f
print(
    f"geoms {[g.padded_shape for g in solver.geoms]}  "
    f"tier {type(ker).__name__}",
    flush=True,
)

RES = {}


def timed(name, step, n1=2, n2=6):
    """step: carry -> carry where carry is (v-like array, acc scalar)."""

    def body(i, carry):
        vv, acc = carry
        out = step(vv)
        acc = acc + out.ravel()[0].astype(jnp.float32)
        return (vv + jnp.zeros((), vv.dtype) * acc.astype(vv.dtype), acc)

    fn = jax.jit(
        lambda n: lax.fori_loop(0, n, body, (v, jnp.float32(0)))[1]
    )
    try:
        t0 = time.perf_counter()
        float(fn(n1))
        print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
        ts = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            float(fn(n))
            ts[n] = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        print(f"  [{name}] FAILED: {str(e)[:140]}", flush=True)
        return
    marg = (ts[n2] - ts[n1]) / (n2 - n1)
    RES[name] = marg
    print(f"{name}: {marg*1e3:.2f} ms/call", flush=True)


g0, g1 = solver.geoms[0], solver.geoms[1]

# 1. jnp residual at L0 (what both the v-cycle and the norms pay):
# the EXACT fallback path cycles.v_cycle takes when _rr[0] is None
timed("jnp_residual_L0", lambda vv: ker.residual(0, vv, f, L0.aux))

# 2. jnp full-weighting restrict L0 -> L1
timed(
    "jnp_restrict_L0L1",
    lambda vv: ker.restrict(
        0, vv, L1.aux["m_int"], L1.aux["m_log"]
    ),
)

# 3. jnp prolongation L1 -> L0 (+ correction add)
cv = L1.v
timed(
    "jnp_prolong_corr_L0",
    lambda vv: stencil.apply_correction(
        vv, ker.prolong(0, cv), L0.aux["m_int"]
    ),
)

# 4. diagnostics block (norms + analytic error), bench_step's exact code
def diag(vv):
    lv = (
        type(levels[0])(
            v=vv, f=f, aux=L0.aux
        ),
    ) + tuple(levels[1:])
    l2, _ = prog.residual_norms(lv)
    exact = solver.problem.exact_solution(geo.coords(vv.dtype))
    err = jnp.max(jnp.abs((vv - exact) * L0.aux["m_int"]))
    return (l2 + err)[None]


timed("diag_norms_err", diag)

# 5. pallas residual-restrict at L1 (for comparison: the tier L0 lacks)
import os

rr1 = (getattr(ker, "_rr", None) or [None, None])[1]
if rr1 is not None and os.environ.get("PROBE_PALLAS", "1") == "1":
    timed(
        "pallas_rr_L1",
        lambda vv: rr1(L1.v, L1.f),
    )

# 6. exact coarse solve (fastdiag at the coarsest)
cs = prog._coarse_solvers[-1]
lb = levels[-1]
if cs is not None and os.environ.get("PROBE_PALLAS", "1") == "1":
    timed("coarse_exact", lambda vv: cs(lb.v, lb.f, lb.aux))

print("\n--- summary (ms/call) ---", flush=True)
for k, val in RES.items():
    print(f"{k:22s}: {val*1e3:8.2f}", flush=True)

"""513^3 step decomposition via whole-program differencing.

Standalone-kernel chains hang this environment's remote Mosaic compiler
at 513^3 geometry (see profile513.py), but the full FMG program is known
to compile (bench.py's unroll mode).  So: build FOUR variants of the
whole step — nu=0 (transfers+coarse+cascade only), nu=2, nu=NU, and
nu=NU plus the bench diagnostics — time each as K-unrolled chains
(marginal between K=1 and K=2 cancels the tunnel dispatch), and read
the decomposition off the differences:

  relax slope/nu   = (t[NU] - t[2]) / (NU - 2)
  relax fixed      = t[2] - t[0] - 2*slope
  non-relax core   = t[0]
  diagnostics      = t[NU+diag] - t[NU]

Usage: PYTHONPATH=... python scripts/profile513b.py [N] [NU] [precision]
"""

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
NU = int(sys.argv[2]) if len(sys.argv) > 2 else 20
PREC = sys.argv[3] if len(sys.argv) > 3 else "mixed"

results = {}


def build(nu):
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, coarsest="exact"),
        backend="auto",
        precision=PREC,
    )
    return MultigridSolver(Poisson3D(), N, cfg)


def timed(name, solver, with_diag=False):
    prog = solver.program
    geo = solver.geoms[0]

    def step(lv):
        out = prog.solve_step(lv)
        if not with_diag:
            return out
        l2, _ = prog.residual_norms(out)
        fin = out[0]
        exact = solver.problem.exact_solution(geo.coords(fin.v.dtype))
        diff = (fin.v - exact) * fin.aux["m_int"]
        return out, l2, jnp.max(jnp.abs(diff))

    def chain(k):
        def run(lv):
            for _ in range(k):
                out = step(lv)
                lv = out[0] if with_diag else out
            return (out[1] + out[2]) if with_diag else lv[0].v[1, 1, 1]

        return jax.jit(run, donate_argnums=0)

    ts = {}
    for k in (1, 2):
        t0 = time.perf_counter()
        fn = chain(k).lower(solver.fresh_levels()).compile()
        print(
            f"  [{name} k={k}] compile {time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        best = float("inf")
        for _pass in range(3):
            lv = solver.fresh_levels()
            t0 = time.perf_counter()
            float(fn(lv))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    marg = ts[2] - ts[1]
    results[name] = marg
    print(
        f"{name}: per-step {marg*1e3:.2f} ms  "
        f"(t1={ts[1]*1e3:.1f} ms, t2={ts[2]*1e3:.1f} ms)",
        flush=True,
    )
    return marg


s20 = build(NU)
print(
    f"levels: {[g.padded_shape for g in s20.geoms]}  "
    f"tier={type(s20.program.kernels).__name__}  precision={PREC}",
    flush=True,
)
t20d = timed(f"fmg_nu{NU}_diag", s20, with_diag=True)
t20 = timed(f"fmg_nu{NU}", s20)
t2 = timed("fmg_nu2", build(2))
t0_ = timed("fmg_nu0", build(0))

slope = (t20 - t2) / (NU - 2)
print("\n== decomposition ==", flush=True)
print(f"  relax slope:        {slope*1e3:8.3f} ms/nu", flush=True)
print(f"  relax fixed (nu=2): {(t2 - t0_ - 2*slope)*1e3:8.2f} ms", flush=True)
print(f"  non-relax core:     {t0_*1e3:8.2f} ms", flush=True)
print(f"  diagnostics:        {(t20d - t20)*1e3:8.2f} ms", flush=True)
print(f"  total (nu={NU}+diag): {t20d*1e3:8.2f} ms", flush=True)

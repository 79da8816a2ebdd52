"""513^3 step decomposition — interleaved whole-program differencing.

profile513b.py's sequential K-chained variants were defeated by this
environment's window variance (device speed drifts minutes-scale, so
sequential variants don't compare) and slow 513^3 K=2 compiles.  Here:
per-variant K=1 programs only (at ~260 ms/step the ~28 ms dispatch is
small AND cancels in variant differences), all compiled up front, then
timed in INTERLEAVED rounds (A/B/C/D per round) so window drift hits
every variant equally.  Inputs are forced to materialize (scalar fetch)
before each timed call.

  relax slope/nu   = (t[NU] - t[2]) / (NU - 2)
  relax fixed      = t[2] - t[0] - 2*slope
  non-relax core   = t[0]
  diagnostics      = t[NU+diag] - t[NU]

Usage: PYTHONPATH=... python scripts/profile513c.py [N] [NU] [precision]
"""

import os
import subprocess
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

# tunnel probe (bench.py's recipe): a hung dial often unblocks the next
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


def build(nu):
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, coarsest="exact"),
        backend="auto",
        precision=PREC,
    )
    return MultigridSolver(Poisson3D(), N, cfg)


def make_fn(solver, with_diag):
    prog = solver.program
    geo = solver.geoms[0]

    def step(lv):
        out = prog.solve_step(lv)
        if not with_diag:
            return out[0].v[1, 1, 1]
        l2, _ = prog.residual_norms(out)
        fin = out[0]
        exact = solver.problem.exact_solution(geo.coords(fin.v.dtype))
        diff = (fin.v - exact) * fin.aux["m_int"]
        return l2 + jnp.max(jnp.abs(diff))

    return jax.jit(step, donate_argnums=0)


variants = []  # (name, solver, fn)
s20 = build(NU)
print(
    f"levels: {[g.padded_shape for g in s20.geoms]}  "
    f"tier={type(s20.program.kernels).__name__}  precision={PREC}",
    flush=True,
)
# solvers built LAZILY (not up front): at 513^3 a hierarchy+aux is
# ~1.6 GB and holding four variants' worth of eager device state during
# lowering exhausted the device; lower on abstract avatars instead of
# concrete arrays so compile time touches no HBM at all
specs = [
    (f"fmg_nu{NU}", lambda: s20, False),
    ("fmg_nu2", lambda: build(2), False),
]
# PROF513_MIN=1 drops the nu0 variant (slope + non-relax-total only):
# three 513^3 compiles can exceed a 10-minute window on the remote
# compiler; two usually fit
if os.environ.get("PROF513_MIN", "0") != "1":
    specs.append(("fmg_nu0", lambda: build(0), False))
if os.environ.get("PROF513_DIAG", "0") == "1":
    specs.insert(0, (f"fmg_nu{NU}_diag", lambda: s20, True))
for name, mk, wd in specs:
    solver = mk()
    lv = solver.fresh_levels()
    avatars = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), lv
    )
    for leaf in jax.tree.leaves(lv):
        leaf.delete()
    del lv
    t0 = time.perf_counter()
    fn = make_fn(solver, wd).lower(avatars).compile()
    print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    lv = solver.fresh_levels()
    float(lv[0].v[1, 1, 1])
    t0 = time.perf_counter()
    float(fn(lv))  # warmup (lazy backend setup)
    del lv  # donated; drop the host-side reference too
    print(f"  [{name}] warmup {time.perf_counter()-t0:.2f}s", flush=True)
    variants.append((name, solver, fn))

best = {name: float("inf") for name, _, _ in variants}
for rnd in range(4):
    for name, solver, fn in variants:
        lv = solver.fresh_levels()
        float(lv[0].v[1, 1, 1])  # force inputs to land before timing
        t0 = time.perf_counter()
        float(fn(lv))
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"  r{rnd} {name}: {dt*1e3:.1f} ms", flush=True)

t20d = best.get(f"fmg_nu{NU}_diag")
t20 = best[f"fmg_nu{NU}"]
t2 = best["fmg_nu2"]
t0_ = best.get("fmg_nu0")
slope = (t20 - t2) / (NU - 2)
print("\n== decomposition (best-of-rounds, dispatch ~cancels) ==", flush=True)
print(f"  relax slope:        {slope*1e3:8.3f} ms/nu", flush=True)
if t0_ is not None:
    print(f"  relax fixed (nu=2): {(t2 - t0_ - 2*slope)*1e3:8.2f} ms", flush=True)
    print(f"  non-relax core:     {t0_*1e3:8.2f} ms", flush=True)
print(f"  fixed+core (t2-2*slope): {(t2 - 2*slope)*1e3:8.2f} ms", flush=True)
if t20d is not None:
    print(f"  diagnostics:        {(t20d - t20)*1e3:8.2f} ms", flush=True)
    print(f"  total (nu={NU}+diag): {t20d*1e3:8.2f} ms", flush=True)
print(f"  total (nu={NU}):      {t20*1e3:8.2f} ms", flush=True)

"""2049^2 lyapunov L0-leg decomposition with STATIC unrolled chains
(the dynamic-trip fori around pallas calls hangs this environment's
remote Mosaic compiler in bad windows; profile_lyap.py is the
fori-based variant).

Times, interleaved: L0 relax legs at two nu values (slope = per-sweep
cost incl. amortized conversions), the dense<->split conversion pair,
and the full FMG step at two nu values (slope = all-level per-nu cost).
"""

import subprocess
import sys
import time

import jax

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
K = 6  # chain length

probe = (
    "import jax, jax.numpy as jnp; "
    "a = jnp.ones((128, 128)); print('ok', float((a @ a)[0, 0]))"
)
for attempt in range(6):
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe], timeout=75,
            capture_output=True, text=True,
        )
        if "ok" in r.stdout:
            break
    except subprocess.TimeoutExpired:
        pass
    print(f"[probe] attempt {attempt+1} hung; retrying", flush=True)

cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, 100, 100, coarsest="exact"),
    backend="auto",
)
solver = MultigridSolver(Lyapunov2D(), N, cfg)
ker = solver.program.kernels
geo = solver.geoms[0]
levels = solver.fresh_levels()
v, f = levels[0].v, levels[0].f
relax0 = ker._relax_fns[0]
print(f"L0 padded {geo.padded_shape}; tier {type(ker).__name__}", flush=True)

fns = {}


def compile_fn(name, make):
    t0 = time.perf_counter()
    fn = jax.jit(make).lower().compile()
    print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    float(fn())  # warmup
    fns[name] = fn


# L0 relax leg chains at two nu (f_zero path: the bench-relevant one)
for nu in (40, 100):
    def mk(nu=nu):
        def run():
            vv = v
            for _ in range(K):
                vv = relax0(vv, f, nu, f_zero=True)
            return vv[1, 1]
        return run
    compile_fn(f"L0_leg_nu{nu}", mk())

# dense<->split conversion pair chain
from pde_multigrid_tpu.ops.pallas import relax as R

qx = R._qx_mask(geo.padded_shape[0])


def mk_conv():
    def run():
        vv = v
        for _ in range(K * 4):
            vv = R.merge_colors_2d(*R.split_colors_2d(vv, qx), qx)
        return vv[1, 1]
    return run


compile_fn("conv_pair_x4", mk_conv())

# full FMG step at two nu
for nu in (40, 100):
    c = SolverConfig(
        cycle=CycleConfig("fmg", 2, nu, nu, coarsest="exact"),
        backend="auto",
    )
    s = MultigridSolver(Lyapunov2D(), N, c)
    lv0 = s.fresh_levels()

    def mk(s=s, lv0=lv0):
        def run():
            lv = lv0
            for _ in range(2):
                lv = s.program.solve_step(lv)
            return lv[0].v[1, 1]
        return run
    compile_fn(f"fmg_nu{nu}", mk())

best = {n: float("inf") for n in fns}
for rnd in range(4):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        float(fn())
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"  r{rnd} {name}: {dt*1e3:.1f} ms", flush=True)

l40, l100 = best["L0_leg_nu40"] / K, best["L0_leg_nu100"] / K
sweep = (l100 - l40) / 60
fixed = l40 - 40 * sweep
conv = best["conv_pair_x4"] / (K * 4)
f40, f100 = best["fmg_nu40"] / 2, best["fmg_nu100"] / 2
fslope = (f100 - f40) / 60
print("\n== L0 decomposition ==", flush=True)
print(f"  L0 per-sweep slope:   {sweep*1e6:8.1f} us", flush=True)
print(f"  L0 per-leg fixed:     {fixed*1e3:8.2f} ms", flush=True)
print(f"  conv pair (split+merge): {conv*1e6:6.1f} us", flush=True)
print(f"  FMG per-nu slope:     {fslope*1e6:8.1f} us/nu", flush=True)
print(
    f"  L0 share of slope:    {400*sweep/fslope:.0f}% (4 legs/nu)",
    flush=True,
)
print(f"  FMG fixed (nu=40):    {(f40 - 40*fslope)*1e3:8.2f} ms", flush=True)

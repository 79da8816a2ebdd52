"""Component breakdown of the 513^3 FMG step (VERDICT r2 #6 follow-up).

The remote Mosaic compiler hangs on lax.fori_loop wrapped around the
step's pallas calls at 513^3-class geometry, so unlike profile257.py
this script chains components with STATIC unrolling (K repeated calls,
naturally data-dependent through the carried state) and fits
marginal = (t_k2 - t_k1) / (k2 - k1), which cancels the tunnel's
per-dispatch overhead exactly like the dynamic-trip variant.

Usage: PYTHONPATH=... python scripts/profile513.py [N] [NU] [precision]
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

cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, NU, NU, coarsest="exact"),
    backend="auto",
    precision=PREC,
)
solver = MultigridSolver(Poisson3D(), N, cfg)
prog = solver.program
ker = prog.kernels
levels = solver.fresh_levels()
nlev = len(levels)
print(
    f"levels: {[g.padded_shape for g in solver.geoms]}  tier="
    f"{type(ker).__name__}  precision={PREC}",
    flush=True,
)

RESULTS = {}


def timed(name, make_chain, k1=1, k2=3):
    """make_chain(k) -> jitted 0-arg callable returning a scalar."""
    fns = {}
    for k in (k1, k2):
        t0 = time.perf_counter()
        fns[k] = make_chain(k)
        float(fns[k]())  # compile + warmup
        print(
            f"  [{name} k={k}] compile+1st {time.perf_counter()-t0:.1f}s",
            flush=True,
        )
    ts = {}
    for k in (k1, k2):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(fns[k]())
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    marg = (ts[k2] - ts[k1]) / (k2 - k1)
    RESULTS[name] = marg
    print(
        f"{name}: marginal {marg*1e3:.2f} ms/call"
        f"  (t{k1}={ts[k1]*1e3:.1f} ms, t{k2}={ts[k2]*1e3:.1f} ms)",
        flush=True,
    )
    return marg


# -- relax legs: one dispatcher call of NU sweeps, chained v -> v --------
# go through ker.relax (the path the real step takes: defect tier under
# mixed precision, else the planned pallas kernel)
for l in range(min(2, nlev - 1)):
    lvl = levels[l]
    kind = (
        "defect"
        if getattr(ker, "_defect_fns", [None] * nlev)[l] is not None
        else ("pallas" if ker._relax_fns[l] is not None else "jnp")
    )
    call = lambda vv, l=l, f=lvl.f, aux=lvl.aux: ker.relax(
        l, vv, f, aux, NU
    )

    def mk(k, call=call, v0=lvl.v):
        def run():
            vv = v0
            for _ in range(k):
                vv = call(vv)
            return vv[1, 1, 1]

        return jax.jit(run)

    timed(f"L{l}_relax_call{NU}_{kind}", mk)

# -- v_cycle at l (natural levels -> levels chaining) --------------------
for l in (0, 1):
    if l >= nlev - 1:
        continue

    def mkv(k, l=l):
        def run():
            lv = levels
            for _ in range(k):
                lv = prog.v_cycle(lv, l)
            return lv[l].v[1, 1, 1]

        return jax.jit(run)

    timed(f"vcycle_l{l}", mkv)

# -- full FMG step -------------------------------------------------------


def mk_fmg(k):
    def run():
        lv = levels
        for _ in range(k):
            lv = prog.solve_step(lv)
        return lv[0].v[1, 1, 1]

    return jax.jit(run)


t_fmg = timed("fmg_step", mk_fmg, 1, 2)

# -- FMG + bench diagnostics (residual norms + exact-error Linf) ---------
geo = solver.geoms[0]


def mk_bench(k):
    def run():
        lv = levels
        s = jnp.float32(0)
        for _ in range(k):
            lv = prog.solve_step(lv)
            l2, _ = prog.residual_norms(lv)
            fin = lv[0]
            exact = solver.problem.exact_solution(geo.coords(fin.v.dtype))
            diff = (fin.v - exact) * fin.aux["m_int"]
            s = s + l2 + jnp.max(jnp.abs(diff))
        return s

    return jax.jit(run)


t_bench = timed("fmg_step_plus_diag", mk_bench, 1, 2)

print("\n== summary ==", flush=True)
for k, v in RESULTS.items():
    print(f"  {k:28s} {v*1e3:9.2f} ms", flush=True)
r = RESULTS
if "vcycle_l0" in r and "fmg_step" in r:
    print(
        f"  2*vcycle_l0 + 2*vcycle_l1 =    "
        f"{(2*r['vcycle_l0'] + 2*r.get('vcycle_l1', 0))*1e3:.2f} ms"
        f"  (FMG upward-leg model; rest = coarser cycles + cascade +"
        f" prolongs)",
        flush=True,
    )
    print(
        f"  diagnostics overhead =         "
        f"{(r['fmg_step_plus_diag'] - r['fmg_step'])*1e3:.2f} ms",
        flush=True,
    )
    l0r = [v for k_, v in r.items() if k_.startswith("L0_relax")]
    if l0r:
        print(
            f"  vcycle_l0 - 2*L0_relax =       "
            f"{(r['vcycle_l0'] - 2*l0r[0])*1e3:.2f} ms"
            f"  (L0 transfers + sub-V-cycle)",
            flush=True,
        )

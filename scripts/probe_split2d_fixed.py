"""Decompose the 2D split-slab LEG FIXED cost (~4.5 ms/leg at 2049^2,
profile_lyap2.py) into: dense->split entry (split+pad), merge exit,
and per-kernel-invocation overhead (nu=16 vs 32: one extra T-chunk).

All static unrolled chains, interleaved rounds, one process.
"""

import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)
from pde_multigrid_tpu.ops.pallas import relax as R

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
K = 8

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
X, Y = geo.padded_shape
Y2 = Y // 2
Y2p = (Y2 + 127) // 128 * 128
qx = R._qx_mask(X)
print(f"L0 padded {geo.padded_shape} Y2p={Y2p}", flush=True)

fns = {}


def compile_fn(name, make):
    t0 = time.perf_counter()
    fn = jax.jit(make).lower().compile()
    print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    float(fn())
    fns[name] = fn


# (a) entry: split + pad, chained through a cheap coupling
def mk_entry():
    def run():
        vv = v
        for _ in range(K):
            r_, b_ = R.split_colors_2d(vv, qx)
            r_ = jnp.pad(r_, ((0, 0), (0, Y2p - Y2)))
            b_ = jnp.pad(b_, ((0, 0), (0, Y2p - Y2)))
            # couple back to dense WITHOUT merge: cheap scalar fold
            vv = vv + (r_[1, 1] + b_[1, 1]) * jnp.float32(1e-30)
        return vv[1, 1]
    return run


# (b) exit: merge only (halves produced once outside the chain)
r0s, b0s = (
    jnp.pad(a, ((0, 0), (0, Y2p - Y2)))
    for a in R.split_colors_2d(v, qx)
)


def mk_merge():
    def run():
        rr = r0s
        out = jnp.float32(0)
        for _ in range(K):
            m = R.merge_colors_2d(rr[:, :Y2], b0s[:, :Y2], qx)
            out = out + m[1, 1]
            rr = rr + out * jnp.float32(1e-30)
        return out
    return run


# (c) relax legs nu=16 vs nu=32 (1 vs 2 T-chunk invocations)
def mk_leg(nu):
    def run():
        vv = v
        for _ in range(K):
            vv = relax0(vv, f, nu, f_zero=True)
        return vv[1, 1]
    return run


compile_fn("entry_split_pad", mk_entry())
compile_fn("merge_exit", mk_merge())
compile_fn("leg_nu16", mk_leg(16))
compile_fn("leg_nu32", mk_leg(32))

best = {n: float("inf") for n in fns}
for rnd in range(4):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        float(fn())
        dt = time.perf_counter() - t0
        best[name] = min(best[name], dt)
        print(f"  r{rnd} {name}: {dt*1e3:.1f} ms", flush=True)

entry = best["entry_split_pad"] / K
merge = best["merge_exit"] / K
l16, l32 = best["leg_nu16"] / K, best["leg_nu32"] / K
sweep = (l32 - l16) / 16  # includes per-invocation share at T=16
inv = l32 - 2 * (l16 - (entry + merge)) + (entry + merge)
print("\n== leg fixed decomposition ==", flush=True)
print(f"  entry (split+pad):  {entry*1e3:7.2f} ms", flush=True)
print(f"  exit  (merge):      {merge*1e3:7.2f} ms", flush=True)
print(f"  leg nu=16 total:    {l16*1e3:7.2f} ms", flush=True)
print(f"  leg nu=32 total:    {l32*1e3:7.2f} ms", flush=True)
print(f"  marginal chunk (16 sweeps + 1 invocation): {(l32-l16)*1e3:7.2f} ms", flush=True)
print(
    f"  => leg residue (l16 - entry - merge - chunk): "
    f"{(l16 - entry - merge - (l32 - l16))*1e3:7.2f} ms",
    flush=True,
)

"""Where does ode1d's slope go?  (VERDICT r4 #9)

BENCH_r04 put the thesis N=8193 row at 11.2% slope-of-roofline.  The
hypothesis: at N=8193 the full-tile halves are (32, 128) = FOUR vregs
per color — a red/black sweep is a short serial dependency chain (black
consumes freshly-written red), so the per-sweep cost is ALU/select
LATENCY, not throughput; the VPU-throughput roofline is simply the
wrong model at this size.  Test: measure the L0 relax leg's per-sweep
slope at growing N in ONE process (interleaved).  If the latency story
is right, ns/sweep stays nearly FLAT while N grows 8-64x (more vregs
fill the chain's bubbles for free) until the working set leaves the
latency regime, after which updates/s approaches the roofline.

Usage:  python scripts/probe_ode1d_slope.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Ode1D,
    SolverConfig,
)
from pde_multigrid_tpu.utils import roofline as RL

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
# the 1D kernel tier is resident-only (plan_relax: no 1D slab tier), so
# the scaling diagnostic runs within the resident budget
SIZES = (2049, 8193, 16385)
NU_LO, NU_HI = 1000, 20000
ROUNDS = 3


def leg_marginal(solver, nu, reps):
    relax0 = solver.program.kernels._relax_fns[0]
    lvl = solver.fresh_levels()[0]
    v, f = lvl.v, lvl.f

    fn = jax.jit(
        lambda n: lax.fori_loop(
            0, n, lambda i, vv: relax0(vv, f, nu), v
        )[1]
    )
    float(fn(1))  # compile + warm
    outs = []
    for _ in range(ROUNDS):
        ts = {}
        for n in (2, 2 + reps):
            t0 = time.perf_counter()
            float(fn(n))
            ts[n] = time.perf_counter() - t0
        outs.append((ts[2 + reps] - ts[2]) / reps)
    outs.sort()
    return outs[len(outs) // 2]  # median kills pool spikes


def main():
    vpu1d = RL.vpu_bound_updates_per_s(1)
    for n in SIZES:
        cfg = SolverConfig(
            cycle=CycleConfig("fmg", 2, 100, 100), backend="auto",
            num_levels=2,
        )
        s = MultigridSolver(Ode1D(), n, cfg)
        kind = type(s.program.kernels).__name__
        fns = getattr(s.program.kernels, "_relax_fns", [None])
        if fns[0] is None:
            print(f"n={n}: no kernel tier ({kind}); skipped", flush=True)
            continue
        slopes = []
        for _ in range(2):  # interleaved lo/hi pairs
            m_lo = leg_marginal(s, NU_LO, REPS)
            m_hi = leg_marginal(s, NU_HI, REPS)
            slopes.append((m_hi - m_lo) / (NU_HI - NU_LO))
        per_sweep = min(s_ for s_ in slopes if s_ > 0) if any(
            s_ > 0 for s_ in slopes
        ) else slopes[0]
        ups = (n - 2) / per_sweep
        rows = ((n - 1) // 2 + 127) // 128
        print(
            f"n={n}: per-sweep {per_sweep * 1e9:.1f} ns "
            f"({rows} rows/half = {max(rows // 8, 1)} vregs) -> "
            f"{ups:.3e} updates/s = {100 * ups / vpu1d:.1f}% of the "
            f"1D VPU bound",
            flush=True,
        )


if __name__ == "__main__":
    main()

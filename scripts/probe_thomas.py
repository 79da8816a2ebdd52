"""Isolate the anis3d zebra-sweep cost: Thomas scans vs build/blend.

Times, at the 257^3 L0 padded shape, with dispatch-cancelling chained
fori loops: (a) the blocked-scan Thomas solve alone, (b) the d-build +
zebra blend alone (Thomas replaced by identity), (c) the full
relax_zebra_line sweep.  Usage: python scripts/probe_thomas.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.ops import stencil

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6

cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, 4, 4, smoother="line-0", mu=2),
    backend="auto",
    num_levels=2,
)
prob = Poisson(3, ((0.0, 0.05), (0.0, 1.0), (0.0, 1.0)))
s = MultigridSolver(prob, 257, cfg)
geo = s.geoms[0]
lvl = s.fresh_levels()[0]
v, f = lvl.v, lvl.f
m_int = lvl.aux["m_int"]
build = prob.line_system(0, geo)
a_r, b_r, c_r, _ = build(v, f)
print(f"L0 padded {geo.padded_shape}", flush=True)


def timed(name, step, n1=2, n2=2 + REPS):
    # f/m_int enter as jit ARGUMENTS — closure-captured device arrays
    # embed as 100 MB program constants and bust the upload limit
    fn = jax.jit(
        lambda n, vv0, ff, mm: lax.fori_loop(
            0, n, lambda i, vv: step(vv, ff, mm), vv0
        )[1, 1, 1]
    )
    float(fn(1, v, f, m_int))
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        float(fn(n, v, f, m_int))
        ts[n] = time.perf_counter() - t0
    marg = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"{name}: {marg * 1e3:.2f} ms/instance", flush=True)
    return marg


# (a) Thomas alone on a v-shaped d
timed(
    "thomas_only",
    lambda vv, ff, mm: stencil.thomas_tridiagonal(
        a_r, b_r, c_r, vv, 0
    ),
)

# (b) build + blend with identity "solve"
mz = (np.arange(geo.padded_shape[1]) % 2 == 0).astype(np.float32)
mz = mz.reshape(1, -1, 1)


def build_blend(vv, ff, mm):
    _, _, _, d = build(vv, ff)
    sol = d  # identity stand-in
    return vv + (jnp.asarray(mz) * mm) * (sol - vv)


timed("build_blend_only", build_blend)

# (c) one full zebra sweep via the real path
from pde_multigrid_tpu.cycles import _zebra_masks

zm = _zebra_masks(geo, 1, jnp.float32)
timed(
    "full_zebra_sweep",
    lambda vv, ff, mm: stencil.relax_zebra_line(
        build, vv, ff, mm, 0, 1, zm, 1
    ),
)

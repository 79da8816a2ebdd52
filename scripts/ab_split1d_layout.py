"""Interleaved A/B: 1D color-split resident kernel, (R, 128) full-tile
layout vs the old (1, N/2) single-sublane layout (round 4).

A (1, X) value occupies one vreg per 128 lanes at 1/8 sublane
occupancy; the full-tile layout should cut the VPU op count ~8x at the
cost of a per-sweep row-seam select for black's east neighbor.

Usage: python scripts/ab_split1d_layout.py [n] [reps]
Two-nu fits per layout; within-process interleaved rounds only
(shared-pool variance).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Ode1D
from pde_multigrid_tpu.ops.pallas import relax as R

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8193
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
NU_LO = int(sys.argv[3]) if len(sys.argv) > 3 else 200
NU_HI = int(sys.argv[4]) if len(sys.argv) > 4 else 1000

prob = Ode1D()
h = Hierarchy.build(prob, N, pad_last_to=128)
geom = h.geoms[0]
lvl = h.levels[0]
rng = np.random.default_rng(2)
v0 = jnp.asarray(
    rng.standard_normal(geom.padded_shape), jnp.float32
) * lvl.aux["m_int"]
f = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)

fns = {
    "tiles": R.make_split_resident_relax_1d(
        prob, geom, jnp.float32, full_tiles=True
    ),
    "row": R.make_split_resident_relax_1d(
        prob, geom, jnp.float32, full_tiles=False
    ),
}
# parity first: both layouts must agree exactly
a = np.asarray(fns["tiles"](v0, f, 7))
b = np.asarray(fns["row"](v0, f, 7))
np.testing.assert_array_equal(a, b)
print("layout parity: bitwise equal (ns=7)", flush=True)


def run(fn, nu):
    c = jax.jit(lambda v, f: fn(v, f, nu)).lower(v0, f).compile()
    out = c(v0, f)
    float(out[1])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = c(out * jnp.float32(1.0), f)
    float(out[1])
    return (time.perf_counter() - t0) / REPS


acc = {k: [] for k in fns}
for _round in range(2):
    for k, fn in fns.items():
        lo, hi = run(fn, NU_LO), run(fn, NU_HI)
        slope = (hi - lo) / (NU_HI - NU_LO)
        fixed = lo - slope * NU_LO
        acc[k].append((fixed, slope))
        print(
            f"  {k}: fixed={fixed*1e6:.1f} us "
            f"slope={slope*1e9:.2f} ns/nu "
            f"({slope/( (N-2)):.3e} s/update... "
            f"{slope*1e12/(N-2):.2f} ps/update)",
            flush=True,
        )
for k, rs in acc.items():
    sl = sum(r[1] for r in rs) / len(rs)
    fx = sum(r[0] for r in rs) / len(rs)
    print(
        f"{k} MEAN: fixed={fx*1e6:.1f} us slope={sl*1e9:.2f} ns/nu "
        f"= {sl*1e12/(N-2):.2f} ps/update",
        flush=True,
    )

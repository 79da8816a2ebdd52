"""What costs ~250 us per chained iteration around the 1D kernel?

Chains 100 iterations of four bodies inside ONE jitted fori_loop:
  jnp     — elementwise jnp ops on the same (R,128) arrays, no pallas
  copy    — a minimal pallas copy kernel
  relax   — the real 1D split kernel, nu=2 (in-kernel coords/exp setup)
  relax-p — same kernel but coefficient fields passed as operands
            (setup hoisted out of the kernel)  [only if supported]

Usage: python scripts/probe_chain_overhead.py [n] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Ode1D
from pde_multigrid_tpu.ops.pallas import relax as R

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8193
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100

prob = Ode1D()
h = Hierarchy.build(prob, N, pad_last_to=128)
geom = h.geoms[0]
lvl = h.levels[0]
rng = np.random.default_rng(0)
v0 = jnp.asarray(
    rng.standard_normal(geom.padded_shape), jnp.float32
) * lvl.aux["m_int"]
f = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)

relax_fn = R.make_split_resident_relax_1d(prob, geom, jnp.float32)


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * jnp.float32(1.0000001)


(Npad,) = geom.padded_shape
x2 = v0.reshape(Npad // 128, 128)
copy_call = pl.pallas_call(
    copy_kernel,
    out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)

BODIES = {
    "jnp": lambda v: v * jnp.float32(0.999) + jnp.float32(0.001),
    "copy-pallas": lambda v: copy_call(v.reshape(x2.shape)).reshape(
        v.shape
    ),
    "relax nu=2": lambda v: relax_fn(v, f, 2),
    "relax nu=100": lambda v: relax_fn(v, f, 100),
}


def run(label, body):
    def chain(v):
        out = jax.lax.fori_loop(0, REPS, lambda _, vv: body(vv), v)
        return out, jnp.sum(out)

    c = jax.jit(chain).lower(v0).compile()
    out, s = c(v0)
    float(s)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out, s = c(v0)
        float(s)
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"{label:14s} per_iter={best * 1e6:8.1f} us", flush=True)


for _round in range(2):
    for label, body in BODIES.items():
        run(label, body)

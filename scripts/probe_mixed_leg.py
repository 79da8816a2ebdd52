"""Per-leg fixed-cost probe: chain K whole relax LEGS (ns=1 and ns=25)
inside one jit for mixed vs f32, so per-leg overheads (conversions,
residual-split, fold, zeros) are measured in-graph where they actually
run.  leg_cost(ns) ~= fixed + ns * slope."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Poisson
from pde_multigrid_tpu.ops.pallas import defect as D
from pde_multigrid_tpu.ops.pallas import relax as R


def chain_time(fn, v, f, ns, K, reps=8):
    def prog(v):
        return lax.fori_loop(0, K, lambda i, vv: fn(vv, f, ns), v)

    c = jax.jit(prog).lower(v).compile()
    out = c(v)
    float(out[1, 1, 1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(out)
    float(out[1, 1, 1])
    return (time.perf_counter() - t0) / (reps * K)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    prob = Poisson(3)
    h = Hierarchy.build(prob, n, pad_last_to=128, pad_sublane_to=8, wrap=True)
    geom = h.geoms[0]
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(geom.padded_shape).astype(np.float32))
    f = jnp.asarray(rng.standard_normal(geom.padded_shape).astype(np.float32))

    f32fn = R.plan_relax(prob, geom, jnp.float32)
    mixedfn = D.plan_defect_relax(prob, geom, jnp.float32)

    for tag, fn in (("f32", f32fn), ("mixed", mixedfn)):
        t1 = chain_time(fn, v, f, 1, 16)
        t25 = chain_time(fn, v, f, 25, 4)
        slope = (t25 - t1) / 24
        fixed = t1 - slope
        print(
            f"{tag}: leg(1)={t1 * 1e6:.0f}us leg(25)={t25 * 1e6:.0f}us "
            f"slope={slope * 1e6:.1f}us/sweep fixed={fixed * 1e6:.0f}us/leg",
            flush=True,
        )


if __name__ == "__main__":
    main()

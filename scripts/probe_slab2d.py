"""Per-sweep slope of the 2D slab relax kernel at 2049^2 (lyapunov L0):
measured in-graph, ns=1 vs ns=49, same process."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Lyapunov2D
from pde_multigrid_tpu.ops.pallas import relax as R


def slope(tag, fn, v, f, lo=1, hi=49, reps=8):
    ts = {}
    for ns in (lo, hi):
        c = jax.jit(lambda a: fn(a, f, ns)).lower(v).compile()
        out = c(v)
        float(out[1, 1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = c(out)
        float(out[1, 1])
        ts[ns] = (time.perf_counter() - t0) / reps
    sl = (ts[hi] - ts[lo]) / (hi - lo)
    print(
        f"{tag}: t({lo})={ts[lo]*1e3:.2f} t({hi})={ts[hi]*1e3:.2f} ms "
        f"slope={sl*1e6:.1f} us/sweep",
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    prob = Lyapunov2D()
    h = Hierarchy.build(prob, n, pad_last_to=128, pad_sublane_to=8)
    geom = h.geoms[0]
    print("shape", geom.padded_shape, "wrap", geom.wrap, flush=True)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal(geom.padded_shape).astype(np.float32))
    f = jnp.asarray(rng.standard_normal(geom.padded_shape).astype(np.float32))
    fn = R.plan_relax(prob, geom, jnp.float32)
    print("tier", "slab" if fn else "none", flush=True)
    slope("plan_relax L0", fn, v, f)
    for B, T in ((64, 4), (64, 1), (32, 4), (16, 1)):
        try:
            k = R.make_slab_relax(prob, geom, jnp.float32, B, T)
            slope(f"slab B={B} T={T}", k, v, f)
        except Exception as e:
            print(f"B={B} T={T}: {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()

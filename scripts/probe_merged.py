"""Per-sweep slope of the dense merged-resident kernel vs the
color-split merged kernel at a 64^3-class level (same process): is the
in-VMEM merged sweep VPU-pass-bound and how much does split-color buy
ignoring conversions?"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Poisson
from pde_multigrid_tpu.ops.pallas import relax as R


def slope(tag, fn, v, f, lo=1, hi=101, reps=12):
    ts = {}
    for ns in (lo, hi):
        c = jax.jit(lambda a, b: fn(a, b, ns)).lower(v, f).compile()
        out = c(v, f)
        float(out[1, 1, 1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = c(out, f)
        float(out[1, 1, 1])
        ts[ns] = (time.perf_counter() - t0) / reps
    sl = (ts[hi] - ts[lo]) / (hi - lo)
    print(
        f"{tag}: t({lo})={ts[lo] * 1e3:.2f} ms t({hi})={ts[hi] * 1e3:.2f} ms"
        f"  slope={sl * 1e6:.2f} us/sweep",
        flush=True,
    )
    return sl


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    prob = Poisson(3)
    h = Hierarchy.build(prob, n, pad_last_to=128, pad_sublane_to=8, wrap=True)
    geom = h.geoms[0]
    print("shape", geom.padded_shape, flush=True)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal(geom.padded_shape).astype(np.float32))
    f = jnp.asarray(rng.standard_normal(geom.padded_shape).astype(np.float32))

    dense = R.make_merged_resident_relax(prob, geom, jnp.float32)
    slope("dense merged", dense, v, f)
    split = R.make_split_merged_relax(prob, geom, jnp.float32)
    slope("split merged (conversions in fixed)", split, v, f)


if __name__ == "__main__":
    main()

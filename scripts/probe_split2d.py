"""In-graph probes for the 2D split-color design at 2049^2: XLA
split/merge converter cost (lane-dim reshape+select) and the dense slab
kernel's true in-graph per-sweep slope."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Lyapunov2D
from pde_multigrid_tpu.ops.pallas import relax as R


def chain(tag, step, x0, K=32, reps=6):
    c = jax.jit(
        lambda x: lax.fori_loop(0, K, lambda i, xx: step(xx), x)
    ).lower(x0).compile()
    out = c(x0)
    float(out.reshape(-1)[11])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(out)
    float(out.reshape(-1)[11])
    print(
        f"{tag}: {(time.perf_counter() - t0) / (reps * K) * 1e6:.0f} us",
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    prob = Lyapunov2D()
    h = Hierarchy.build(prob, n, pad_last_to=128, pad_sublane_to=8)
    geom = h.geoms[0]
    X, Y = geom.padded_shape
    Y2 = Y // 2
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((X, Y)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((X, Y)).astype(np.float32))
    qx = (jnp.arange(X) % 2 == 1)[:, None]

    def split_merge(a):
        a2 = a.reshape(X, Y2, 2)
        v0, v1 = a2[:, :, 0], a2[:, :, 1]
        r = jnp.where(qx, v1, v0)
        b = jnp.where(qx, v0, v1)
        v0b = jnp.where(qx, b, r)
        v1b = jnp.where(qx, r, b)
        return jnp.stack([v0b, v1b], axis=2).reshape(X, Y)

    chain("2D split+merge (XLA)", split_merge, v)

    fn = R.plan_relax(prob, geom, jnp.float32)
    chain("dense slab 1 sweep", lambda x: fn(x, f, 1), v, K=16)
    chain("dense slab 8 sweeps", lambda x: fn(x, f, 8), v, K=8)
    chain("dense slab 16 sweeps", lambda x: fn(x, f, 16), v, K=4)


if __name__ == "__main__":
    main()

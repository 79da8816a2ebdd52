"""Chained in-graph timing of the defect path's per-leg fixed pieces:
rsplit (residual+split+cast), fold (merge+fold), zeros materialization,
and a 1-sweep inner call — each chained K deep inside one jit so the
tunnel dispatch amortizes away."""

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


def chain(tag, step, x0, K=32, reps=6):
    c = jax.jit(
        lambda x: lax.fori_loop(0, K, lambda i, xx: step(xx), x)
    ).lower(x0).compile()
    out = c(x0)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[7])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(out)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[7])
    dt = (time.perf_counter() - t0) / (reps * K)
    print(f"{tag}: {dt * 1e6:.0f} us", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    prob = Poisson(3)
    h = Hierarchy.build(prob, n, pad_last_to=128, pad_sublane_to=8, wrap=True)
    geom = h.geoms[0]
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    f = jnp.asarray(rng.standard_normal((X, Y, Z)).astype(np.float32))
    B16 = jnp.bfloat16

    rsplit = D.make_residual_split(prob, geom, jnp.float32, B16)
    fold = D.make_merge_fold(geom, B16, jnp.float32)
    rr, rb = jax.jit(rsplit)(v, f)

    # rsplit+fold pair chained (the per-leg fixed work minus zeros);
    # fold alone chained; rsplit ~= pair - fold
    chain("rsplit+fold", lambda x: fold(*rsplit(x, f), x), v)
    chain("fold", lambda x: fold(rr, rb, x), v)

    inner = D.plan_defect_relax(prob, geom, jnp.float32)
    # full leg at ns=1 and the bare f32 relax for reference
    f32fn = R.plan_relax(prob, geom, jnp.float32)
    chain("leg ns=1 (mixed)", lambda x: inner(x, f, 1), v, K=16)
    chain("leg ns=1 (f32)", lambda x: f32fn(x, f, 1), v, K=16)
    chain("leg ns=8 (mixed)", lambda x: inner(x, f, 8), v, K=8)
    chain("leg ns=8 (f32)", lambda x: f32fn(x, f, 8), v, K=8)


if __name__ == "__main__":
    main()

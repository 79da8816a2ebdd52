"""Probe the mixed-precision pieces on TPU: per-sweep slope of the bf16
inner smoother vs the f32 split-slab smoother (fit time = a + b*ns inside
one process), plus the fixed rsplit/fold cost."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Poisson
from pde_multigrid_tpu.ops.pallas import defect as D
from pde_multigrid_tpu.ops.pallas import relax as R


def timed(tag, fn, *args, reps=20):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.max(jnp.abs(s[1])))  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.max(jnp.abs(s[1])))
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt * 1e3:.3f} ms", flush=True)
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

    f32fn = R.plan_relax(prob, geom, jnp.float32)
    print("f32 relax tier:", type(f32fn).__name__, flush=True)
    t1 = timed("f32 relax ns=1", lambda a, b: f32fn(a, b, 1), v, f)
    t51 = timed("f32 relax ns=51", lambda a, b: f32fn(a, b, 51), v, f)
    print(f"f32 slope {1e6 * (t51 - t1) / 50:.2f} us/sweep", flush=True)

    mixedfn = D.plan_defect_relax(prob, geom, jnp.float32)
    m1 = timed("mixed relax ns=1", lambda a, b: mixedfn(a, b, 1), v, f)
    m51 = timed("mixed relax ns=51", lambda a, b: mixedfn(a, b, 51), v, f)
    print(f"mixed slope {1e6 * (m51 - m1) / 50:.2f} us/sweep", flush=True)

    # pieces
    rsplit = D.make_residual_split(prob, geom, jnp.float32, jnp.bfloat16)
    fold = D.make_merge_fold(geom, jnp.bfloat16, jnp.float32)
    rr, rb = jax.jit(rsplit)(v, f)
    timed("rsplit", rsplit, v, f)
    timed("fold", fold, rr, rb, v)

    # raw bf16 inner alone
    T = R.SPLIT_SWEEPS_PER_CALL
    for B in (16, 8, 4):
        if X % B == 0 and X >= B + 4 * T:
            break
    inner = R.make_split_slab_relax(
        prob, geom, jnp.bfloat16, B, sweeps_per_call=T, raw=True
    )
    z = jnp.zeros((X, Y2, Z), jnp.bfloat16)
    i1 = timed("bf16 inner ns=1", lambda a, b: inner(z, z, a, b, 1), rr, rb)
    i51 = timed(
        "bf16 inner ns=51", lambda a, b: inner(z, z, a, b, 51), rr, rb
    )
    print(f"bf16 inner slope {1e6 * (i51 - i1) / 50:.2f} us/sweep", flush=True)


if __name__ == "__main__":
    main()

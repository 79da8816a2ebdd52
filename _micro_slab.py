"""Microbench: per-sweep cost of the fine-level relax kernel at 129^3."""
import time, sys
import jax, jax.numpy as jnp
from pde_multigrid_tpu import Poisson3D, SolverConfig, CycleConfig, MultigridSolver
from pde_multigrid_tpu.ops.pallas import relax as R

solver = MultigridSolver(Poisson3D(), 129, SolverConfig(cycle=CycleConfig("v", 1, 1, 1)))
geom = solver.geoms[0]
print("geom", geom.padded_shape, "wrap", geom.wrap, file=sys.stderr)
prob = solver.problem
fn = R.plan_relax(prob, geom, jnp.float32)
print("kernel:", fn, file=sys.stderr)

lv = solver.fresh_levels()[0]
v, f = lv.v, lv.f

for nsweeps in (1, 10, 100):
    g = jax.jit(lambda v, f: fn(v, f, nsweeps))
    out = g(v, f); out.block_until_ready()
    # time via chaining
    reps = max(1, 400 // nsweeps)
    t0 = time.perf_counter()
    vv = v
    for _ in range(reps):
        vv = g(vv, f)
    vv.block_until_ready()
    dt = time.perf_counter() - t0
    per_sweep = dt / (reps * nsweeps)
    print(f"nsweeps={nsweeps}: {per_sweep*1e6:.1f} us/sweep  ({reps} reps)")

# jnp-tier comparison (masked full-array updates)
from pde_multigrid_tpu.cycles import JnpKernels
jk = JnpKernels(prob, solver.geoms)
gj = jax.jit(lambda v, f: jk.relax(0, v, f, lv.aux, 10))
out = gj(v, f); out.block_until_ready()
t0 = time.perf_counter()
vv = v
for _ in range(10):
    vv = gj(vv, f)
vv.block_until_ready()
dt = time.perf_counter() - t0
print(f"jnp tier: {dt/100*1e6:.1f} us/sweep")

"""In-process component breakdown of the 257^3 FMG step on TPU.

Times each hot component by chaining it n times inside ONE jitted
function with a *dynamic* trip count (one compile per component), and
fitting marginal = (t2 - t1) / (n2 - n1), which cancels the axon
tunnel's per-call dispatch overhead.  Sync via scalar fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import CycleConfig, MultigridSolver, Poisson3D, SolverConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 257
NU = int(sys.argv[2]) if len(sys.argv) > 2 else 20

cfg = SolverConfig(cycle=CycleConfig("fmg", 2, NU, NU), backend="auto")
solver = MultigridSolver(Poisson3D(), N, cfg)
prog = solver.program
ker = prog.kernels
geo = solver.geoms[0]
levels = solver.fresh_levels()
L0 = levels[0]
v, f = L0.v, L0.f
print(f"kernels tier: {type(ker).__name__}; L0 padded {geo.padded_shape}", flush=True)

RESULTS = {}


def timed(name, fn, n1, n2, unit=1):
    """fn: jitted callable (n) -> scalar.  Prints marginal per `unit`."""
    t0 = time.perf_counter()
    float(fn(n1))  # compile
    print(f"  [{name}] compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        float(fn(n))
        ts[n] = time.perf_counter() - t0
    marg = (ts[n2] - ts[n1]) / (n2 - n1) / unit
    RESULTS[name] = marg
    print(
        f"{name}: marginal {marg*1e6:.1f} us/unit"
        f"  (t{n1}={ts[n1]*1e3:.2f} ms, t{n2}={ts[n2]*1e3:.2f} ms)",
        flush=True,
    )
    return marg


# 1. L0 relax marginal per sweep (dynamic sweep count)
relax0 = ker._relax_fns[0]
relax_j = jax.jit(
    lambda n: lax.fori_loop(0, n, lambda i, vv: relax0(vv, f, 1), v)[1, 1, 1]
)
timed("L0_relax_sweep_us", relax_j, NU, 3 * NU)

# 2. color converters at L0 (split+merge round trip per unit)
from pde_multigrid_tpu.ops.pallas import relax as R

csplit, cmerge = R.make_color_converters(geo, jnp.float32)
if csplit is not None:
    conv_j = jax.jit(
        lambda n: lax.fori_loop(
            0, n, lambda i, vv: cmerge(*csplit(vv)), v
        )[1, 1, 1]
    )
    timed("L0_split_merge_pair", conv_j, 2, 8)

# 3. chaining-epsilon baseline (subtract from rr/res below)
def _eps_chain(step):
    def body(i, carry):
        vv, acc = carry
        acc = acc + step(vv)
        return (vv + acc * jnp.float32(1e-30), acc)

    return jax.jit(lambda n: lax.fori_loop(0, n, body, (v, jnp.float32(0)))[1])


eps_j = _eps_chain(lambda vv: vv[1, 1, 1])
m_eps = timed("chain_eps_baseline", eps_j, 2, 8)

# 4. fused residual+restrict L0 -> L1
rr0 = ker._rr[0]
if rr0 is not None:
    rr_j = _eps_chain(lambda vv: rr0(vv, f)[1, 1, 1])
    timed("L0_residual_restrict", rr_j, 2, 8)

# 5. standalone fused residual at L0
res0 = ker._res[0]
if res0 is not None:
    res_j = _eps_chain(lambda vv: res0(vv, vv, vv, f)[1, 1, 1])
    timed("L0_residual", res_j, 2, 8)

# 6. prolong+blend L1 -> L0
pb0 = ker._pb[0].get("add")
if pb0 is not None:
    cv = levels[1].v
    pb_j = jax.jit(
        lambda n: lax.fori_loop(0, n, lambda i, vv: pb0(cv, vv), v)[1, 1, 1]
    )
    timed("L1_L0_prolong_blend", pb_j, 2, 8)

# 7. whole sub-hierarchy: V-cycle at l=1 (everything below the fine level)
vc1_j = jax.jit(
    lambda n: lax.fori_loop(0, n, lambda i, lv: prog.v_cycle(lv, 1), levels)[
        1
    ].v[1, 1, 1]
)
timed("vcycle_l1_subtree", vc1_j, 1, 4)

print("\n--- summary ---", flush=True)
m = RESULTS
sweep = m.get("L0_relax_sweep_us", 0)
print(f"L0 relax           : {sweep*1e6:8.1f} us/sweep -> {sweep*2*NU*1e3:.2f} ms per V(20,20)")
if "L0_split_merge_pair" in m:
    print(f"L0 split+merge pair: {m['L0_split_merge_pair']*1e3:8.3f} ms")
eps = m.get("chain_eps_baseline", 0)
for k in ("L0_residual_restrict", "L0_residual"):
    if k in m:
        print(f"{k:19s}: {(m[k]-eps)*1e3:8.3f} ms (eps-corrected)")
if "L1_L0_prolong_blend" in m:
    print(f"L1->L0 prolongblend: {m['L1_L0_prolong_blend']*1e3:8.3f} ms")
print(f"vcycle l1 subtree  : {m['vcycle_l1_subtree']*1e3:8.2f} ms")

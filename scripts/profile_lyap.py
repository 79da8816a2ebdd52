"""In-process component breakdown of the lyapunov2d 2049^2 FMG step.

Same harness as profile257.py: each component is chained n times inside
ONE jitted function with a dynamic trip count; marginal = (t2-t1)/(n2-n1)
cancels the axon tunnel's per-call dispatch overhead.  Sync via scalar
fetch.  Components: the 2D split-slab relax (per sweep, with and without
f_zero), the XLA split/merge conversions, fused transfers, the exact
coarse solve, and the whole sub-hierarchy below L0.

Usage: python scripts/profile_lyap.py [n] [nu]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu import (
    CycleConfig,
    Lyapunov2D,
    MultigridSolver,
    SolverConfig,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
NU = int(sys.argv[2]) if len(sys.argv) > 2 else 100

cfg = SolverConfig(
    cycle=CycleConfig("fmg", 2, NU, NU, coarsest="exact"), backend="auto"
)
solver = MultigridSolver(Lyapunov2D(), N, cfg)
prog = solver.program
ker = prog.kernels
geo = solver.geoms[0]
levels = solver.fresh_levels()
L0 = levels[0]
v, f = L0.v, L0.f
print(
    f"kernels tier: {type(ker).__name__}; L0 padded {geo.padded_shape}; "
    f"levels {[g.shape[0] for g in solver.geoms]}",
    flush=True,
)

RESULTS = {}


def timed(name, fn, n1, n2, unit=1, retries=2):
    """Outage-tolerant: the axon tunnel drops mid-session; retry each
    component a couple of times and keep going on failure."""
    for attempt in range(retries + 1):
        try:
            t0 = time.perf_counter()
            float(fn(n1))  # compile
            print(
                f"  [{name}] compile+1st {time.perf_counter()-t0:.1f}s",
                flush=True,
            )
            ts = {}
            for n in (n1, n2):
                t0 = time.perf_counter()
                float(fn(n))
                ts[n] = time.perf_counter() - t0
            break
        except Exception as e:  # noqa: BLE001
            print(
                f"  [{name}] attempt {attempt+1} failed: {str(e)[:120]}",
                flush=True,
            )
            time.sleep(5)
    else:
        return None
    marg = (ts[n2] - ts[n1]) / (n2 - n1) / unit
    RESULTS[name] = marg
    print(
        f"{name}: marginal {marg*1e6:.1f} us/unit"
        f"  (t{n1}={ts[n1]*1e3:.2f} ms, t{n2}={ts[n2]*1e3:.2f} ms)",
        flush=True,
    )
    return marg


def _eps_chain(step):
    def body(i, carry):
        vv, acc = carry
        acc = acc + step(vv)
        return (vv + acc * jnp.float32(1e-30), acc)

    return jax.jit(
        lambda n: lax.fori_loop(0, n, body, (v, jnp.float32(0)))[1]
    )


# 1. L0 relax marginal per sweep: whole legs of NU sweeps, chained with a
# dynamic leg count -> marginal/NU is the per-sweep slope including the
# amortized per-leg conversions; then single-sweep legs isolate the
# per-leg fixed cost.
import os

SKIP_L0 = os.environ.get("PROF_SKIP_L0", "0") == "1"

relax0 = (getattr(ker, "_relax_fns", None) or [None])[0]
if SKIP_L0:
    relax0 = None
# fzero first: it is what every production L0 leg runs (Lyapunov RHS==0);
# the dense-f variant can VMEM-OOM at 4097^2 and is tolerated failing
for tag, fz in (("_fzero", True), ("", False)):
    if relax0 is None:
        break
    if fz and not getattr(relax0, "supports_f_zero", False):
        continue
    kw = {"f_zero": True} if fz else {}
    try:
        leg_j = jax.jit(
            lambda n, kw=kw: lax.fori_loop(
                0, n, lambda i, vv: relax0(vv, f, NU, **kw), v
            )[1, 1]
        )
        m_leg = timed(f"L0_leg{tag}_nu{NU}", leg_j, 2, 6)
        one_j = jax.jit(
            lambda n, kw=kw: lax.fori_loop(
                0, n, lambda i, vv: relax0(vv, f, 1, **kw), v
            )[1, 1]
        )
        m_one = timed(f"L0_leg{tag}_nu1", one_j, 2, 6)
    except Exception as e:  # noqa: BLE001
        print(f"  [L0_leg{tag}] failed: {str(e)[:160]}", flush=True)
        continue
    if m_leg is None or m_one is None:
        continue
    sweep = (m_leg - m_one) / (NU - 1)
    print(
        f"  -> per-sweep slope{tag}: {sweep*1e6:.1f} us, "
        f"per-leg fixed: {(m_one - sweep)*1e3:.3f} ms",
        flush=True,
    )

# 2. raw split/merge conversion cost at L0
from pde_multigrid_tpu.ops.pallas import relax as R

if geo.padded_shape[1] % 2 == 0 and not SKIP_L0:
    qx = R._qx_mask(geo.padded_shape[0])
    conv_j = jax.jit(
        lambda n: lax.fori_loop(
            0,
            n,
            lambda i, vv: R.merge_colors_2d(
                *R.split_colors_2d(vv, qx), qx
            ),
            v,
        )[1, 1]
    )
    timed("L0_split_merge_pair", conv_j, 2, 8)

eps_j = _eps_chain(lambda vv: vv[1, 1])
m_eps = timed("chain_eps_baseline", eps_j, 2, 8) if not SKIP_L0 else 0

# 3. fused residual+restrict L0 -> L1
rr0 = (getattr(ker, "_rr", None) or [None])[0]
if rr0 is not None and not SKIP_L0:
    rr_j = _eps_chain(lambda vv: rr0(vv, f)[1, 1])
    timed("L0_residual_restrict", rr_j, 2, 8)

# 4. prolong+blend L1 -> L0
pb0 = (getattr(ker, "_pb", None) or [{}])[0].get("add")
if pb0 is not None and not SKIP_L0:
    cv = levels[1].v
    pb_j = jax.jit(
        lambda n: lax.fori_loop(0, n, lambda i, vv: pb0(cv, vv), v)[1, 1]
    )
    timed("L1_L0_prolong_blend", pb_j, 2, 8)

# 5. exact coarsest solve (probed dense inverse for Lyapunov)
cs = prog._coarse_solvers[-1]
if cs is not None:
    lb = levels[-1]
    cs_j = jax.jit(
        lambda n: lax.fori_loop(
            0,
            n,
            lambda i, vv: cs(vv, lb.f, lb.aux) * jnp.float32(1.0),
            lb.v,
        )[1, 1]
    )
    timed("coarsest_exact_solve", cs_j, 2, 8)

# 6. per-level relax legs (coarse-level slope efficiency): NU-sweep legs
# chained with a dynamic count, marginal/NU ~= per-sweep cost at level l,
# printed with the level's updates/s vs the VPU roofline
from pde_multigrid_tpu.utils import roofline as RL

vpu_bound = RL.vpu_bound_updates_per_s(2)
nlev = len(levels)
for l in range(1, nlev - 1):
    lvl = levels[l]
    fl = lvl.f
    fn_l = (getattr(ker, "_relax_fns", None) or [None] * nlev)[l]
    if fn_l is None:
        relax_l = lambda vv, fl=fl, l=l, lvl=lvl: ker.relax(
            l, vv, fl, lvl.aux, NU
        )
        kind = "jnp"
    else:
        relax_l = lambda vv, fn_l=fn_l, fl=fl: fn_l(vv, fl, NU)
        kind = getattr(fn_l, "kind", "pallas")
    leg_l = jax.jit(
        lambda n, relax_l=relax_l, lvl=lvl: lax.fori_loop(
            0, n, lambda i, vv: relax_l(vv), lvl.v
        )[1, 1]
    )
    m = timed(f"L{l}_leg_nu{NU}", leg_l, 2, 6)
    if m is not None:
        pts = 1
        for s in solver.geoms[l].shape:
            pts *= s - 2
        ups = pts * NU / m
        print(
            f"  -> L{l} ({solver.geoms[l].shape[0]}^2, {kind}): "
            f"{m/NU*1e6:.1f} us/sweep = {ups:.2e} updates/s "
            f"({100*ups/vpu_bound:.0f}% of VPU bound)",
            flush=True,
        )

# 7. whole sub-hierarchy: V-cycle at l=1
vc1_j = jax.jit(
    lambda n: lax.fori_loop(
        0, n, lambda i, lv: prog.v_cycle(lv, 1, f_is_rhs=False), levels
    )[1].v[1, 1]
)
timed("vcycle_l1_subtree", vc1_j, 1, 3)

print("\n--- summary ---", flush=True)
m = RESULTS
eps = m.get("chain_eps_baseline", 0)
# components timed through _eps_chain carry the chain's own overhead;
# subtract the measured baseline for those
EPS_CHAINED = {"L0_residual_restrict"}
for k, val in m.items():
    corr = val - eps if k in EPS_CHAINED else val
    note = " (eps-corrected)" if k in EPS_CHAINED else ""
    print(f"{k:24s}: {corr*1e3:8.3f} ms{note}", flush=True)

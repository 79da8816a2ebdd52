"""Weak-scaling harness over a device mesh (SURVEY.md §7 L4).

Runs the sharded 3D Poisson FMG step at FIXED per-device work (the x
extent grows with the mesh) and reports per-step time and weak-scaling
efficiency vs the 1-device run.  On real multi-chip hardware this
measures ICI halo-exchange overlap; in this environment it validates
the mechanics on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_mesh.py --base-n 33 --devices 1,2,4,8

(CPU timings measure the harness, not ICI — the driver's real-chip
environment has a single chip, so multi-chip wall-clock numbers await a
real slice; the BASELINE.json target is >= 80% weak-scaling efficiency.)
"""

import argparse
import time

import jax
import numpy as np


def run(n_dev: int, base_n: int, nu: int, reps: int):
    from pde_multigrid_tpu import (
        CycleConfig,
        MultigridSolver,
        Poisson,
        SolverConfig,
    )
    from pde_multigrid_tpu.parallel import mesh as pmesh

    # fixed work per device: x extent AND x domain scale with the mesh
    # (keeping h isotropic — an elongated domain at fixed [0,1] would
    # make RBGS smoothing anisotropically weak and confound the scaling)
    shape = ((base_n - 1) * n_dev + 1, base_n, base_n)
    domain = ((0.0, float(n_dev)), (0.0, 1.0), (0.0, 1.0))
    mesh = pmesh.make_mesh(n_dev) if n_dev > 1 else None
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, nu, nu), pad_axis0_to=max(n_dev, 1)
    )
    s = MultigridSolver(Poisson(3, domain=domain), shape, cfg, mesh=mesh)
    step = jax.jit(s.program.solve_step)
    levels = step(s.fresh_levels())
    jax.block_until_ready(levels)
    t0 = time.perf_counter()
    for _ in range(reps):
        levels = step(levels)
    jax.block_until_ready(levels)
    dt = (time.perf_counter() - t0) / reps
    l2, _ = jax.jit(s.program.residual_norms)(levels)
    return dt, float(l2)


COLLECTIVES = (
    "collective-permute",
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "all-to-all",
)


def census(n_dev: int, n: int, nu: int):
    """Fixed-size run at every mesh size: compile the sharded FMG step,
    count collectives in the optimized HLO, execute ONE step and report
    the residual (VERDICT r4 #10: a correctness + collective-count
    scaling table for the real-hardware rehearsal, wall-clock excluded
    on virtual CPU devices)."""
    from pde_multigrid_tpu import (
        CycleConfig,
        MultigridSolver,
        Poisson,
        SolverConfig,
    )
    from pde_multigrid_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(n_dev) if n_dev > 1 else None
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, nu, nu), pad_axis0_to=max(n_dev, 1)
    )
    s = MultigridSolver(Poisson(3), n, cfg, mesh=mesh)
    levels = s.fresh_levels()
    compiled = jax.jit(s.program.solve_step).lower(levels).compile()
    txt = compiled.as_text()
    counts = {k: txt.count(f" {k}(") + txt.count(f" {k}-start(")
              for k in COLLECTIVES}
    out = compiled(levels)
    jax.block_until_ready(out)
    l2, _ = jax.jit(s.program.residual_norms)(out)
    shard_lvls = sum(
        1
        for g in s.geoms
        if mesh is not None
        and not pmesh.level_sharding(mesh, g).is_fully_replicated
    )
    return counts, float(l2), shard_lvls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-n", type=int, default=33)
    ap.add_argument("--nu", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument(
        "--census", type=int, default=0,
        help="fixed-size collective-count mode at this n (0 = off)",
    )
    args = ap.parse_args()
    counts = [int(x) for x in args.devices.split(",")]
    n_avail = len(jax.devices())
    if args.census:
        for n_dev in counts:
            if n_dev > n_avail:
                continue
            cs, l2, nsh = census(n_dev, args.census, args.nu)
            cs_s = " ".join(f"{k}={v}" for k, v in cs.items() if v)
            print(
                f"n_dev={n_dev} n={args.census} sharded_levels={nsh} "
                f"res_l2={l2:.3e} {cs_s or 'no-collectives'}",
                flush=True,
            )
        return
    base = None
    for n_dev in counts:
        if n_dev > n_avail:
            print(f"n_dev={n_dev}: skipped ({n_avail} devices available)")
            continue
        dt, l2 = run(n_dev, args.base_n, args.nu, args.reps)
        if base is None:
            base = dt
        eff = 100.0 * base / dt
        print(
            f"n_dev={n_dev} x_extent={(args.base_n - 1) * n_dev + 1} "
            f"per_step={dt * 1e3:.1f} ms weak_eff={eff:.0f}% "
            f"res_l2={l2:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()

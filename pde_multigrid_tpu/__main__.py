"""CLI driver: `python -m pde_multigrid_tpu ...`

Replaces the reference's six hard-coded main() programs (SURVEY.md §1)
with one configurable entry point.  `--preset` reproduces the reference
drivers' exact parameters:

  ode1d          Poisson1DSolver.cpp:13-18   N=8193,  FMG(2, 1000, 1000)
  lyapunov2d     LyapunovSolver.cpp:13-31    N=1025^2 [0,1]^2,  FMG(1, 500, 500)
  lyapunov2d-cuda CUDA .../main.cu:13-25     N=65^2  [0,20]^2,  FMG(2, 500, 500)
  poisson3d      Poisson3DSolver.cpp:14-20   N=129^3, FMG(2, 3000, 3000)
  poisson3d-cuda CUDA .../main.cu:18-22      N=257^3, FMG(2, 3000, 3000)

Output: per-cycle JSONL metrics (optional), a summary JSON line, and the
reference-style timing footer ("Used X seconds...", Poisson3DSolver.cpp:44-46).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


PRESETS = {
    "ode1d": dict(problem="ode1d", n=8193, kind="fmg", nu0=2, nu1=1000, nu2=1000),
    "lyapunov2d": dict(
        problem="lyapunov2d", n=1025, kind="fmg", nu0=1, nu1=500, nu2=500
    ),
    "lyapunov2d-cuda": dict(
        problem="lyapunov2d",
        n=65,
        kind="fmg",
        nu0=2,
        nu1=500,
        nu2=500,
        domain=20.0,
    ),
    "poisson3d": dict(
        problem="poisson3d", n=129, kind="fmg", nu0=2, nu1=3000, nu2=3000
    ),
    "poisson3d-cuda": dict(
        problem="poisson3d", n=257, kind="fmg", nu0=2, nu1=3000, nu2=3000
    ),
}


def build_problem(name: str, domain_hi: float | None):
    from pde_multigrid_tpu import (
        HJBMinTime,
        Lyapunov2D,
        Ode1D,
        Poisson,
        VariableCoefficientPoisson,
    )

    dims = {"ode1d": 1, "lyapunov2d": 2}
    if name in ("hjb2d", "hjb2d-tesi"):
        hi = domain_hi or 1.0
        return HJBMinTime(
            domain=((-hi, hi), (-hi, hi)),
            scheme="tesi" if name.endswith("tesi") else "upwind",
        )
    if name == "ode1d":
        dom = ((0.0, domain_hi or 1.0),)
        return Ode1D(domain=dom)
    if name == "lyapunov2d":
        hi = domain_hi or 1.0
        return Lyapunov2D(domain=((0.0, hi), (0.0, hi)))
    if name.startswith("poisson"):
        nd = int(name[len("poisson")] )
        hi = domain_hi or 1.0
        return Poisson(nd, domain=((0.0, hi),) * nd)
    if name.startswith("varcoef"):
        nd = int(name[len("varcoef")])
        return VariableCoefficientPoisson(nd)
    raise SystemExit(f"unknown problem {name!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pde_multigrid_tpu")
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None)
    ap.add_argument(
        "--problem",
        default="poisson3d",
        help="ode1d | lyapunov2d | poisson{1,2,3}d | varcoef{1,2,3}d | hjb2d[-tesi]",
    )
    ap.add_argument("--n", type=int, default=129, help="points per axis (2^k+1)")
    ap.add_argument("--domain", type=float, default=None, help="domain upper bound")
    ap.add_argument("--kind", choices=["v", "w", "fmg"], default="fmg")
    ap.add_argument("--nu0", type=int, default=2)
    ap.add_argument("--nu1", type=int, default=2)
    ap.add_argument("--nu2", type=int, default=2)
    ap.add_argument("--mu", type=int, default=1)
    ap.add_argument(
        "--smoother", default="rbgs", help="rbgs | jacobi | line-K | exact"
    )
    ap.add_argument(
        "--scheme",
        choices=["cs", "fas"],
        default="cs",
        help="coarse-grid correction: cs (linear) | fas (nonlinear)",
    )
    ap.add_argument("--omega", type=float, default=1.0)
    ap.add_argument(
        "--coarse-operator",
        choices=["rediscretize", "galerkin"],
        default="rediscretize",
    )
    ap.add_argument(
        "--coarsest",
        choices=["relax", "exact"],
        default="relax",
        help="coarsest-level solver: reference nu1+nu2 sweeps, or the "
        "fast-diagonalization direct solve (truncates the hierarchy)",
    )
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--backend", default="auto", help="auto | jnp | pallas")
    ap.add_argument(
        "--precision",
        choices=["f32", "mixed"],
        default="f32",
        help="mixed = bf16 defect-correction smoothing (same f32 result)",
    )
    ap.add_argument("--tol", type=float, default=0.0)
    ap.add_argument("--cycles", type=int, default=1, help="max cycles after the first")
    ap.add_argument("--mesh", type=int, default=0, help="shard over N devices")
    ap.add_argument(
        "--distributed",
        default=None,
        metavar="COORD_ADDR",
        help="multi-host: jax.distributed.initialize(coordinator_address"
        "=COORD_ADDR) before device discovery; pair with --num-processes/"
        "--process-id (or rely on the cluster env autodetect by passing "
        "'auto')",
    )
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--metrics", default=None, help="JSONL metrics path")
    ap.add_argument("--checkpoint", default=None, help="save final state here (.npz)")
    ap.add_argument("--resume", default=None, help="resume from checkpoint (.npz)")
    ap.add_argument("--dump-v", default=None, help="write a PrintGrid_v-style dump")
    ap.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the solve into DIR "
        "(view with tensorboard/xprof; SURVEY.md §5 tracing subsystem)",
    )
    args = ap.parse_args(argv)

    if args.preset:
        for k, v in PRESETS[args.preset].items():
            if k == "domain":
                args.domain = v
            else:
                setattr(args, k, v)

    if args.distributed:
        # multi-host entry (SURVEY.md §5: jax.distributed + Mesh): every
        # process runs this same CLI; the mesh below then spans all hosts'
        # devices and GSPMD partitions each level across them
        import jax

        kw = {}
        if args.distributed != "auto":
            kw["coordinator_address"] = args.distributed
        if args.num_processes is not None:
            kw["num_processes"] = args.num_processes
        if args.process_id is not None:
            kw["process_id"] = args.process_id
        jax.distributed.initialize(**kw)

    from pde_multigrid_tpu import CycleConfig, MultigridSolver, SolverConfig
    from pde_multigrid_tpu.utils.metrics import MetricsLogger

    problem = build_problem(args.problem, args.domain)
    cfg = SolverConfig(
        cycle=CycleConfig(
            args.kind,
            args.nu0,
            args.nu1,
            args.nu2,
            args.mu,
            smoother=args.smoother,
            omega=args.omega,
            coarse_operator=args.coarse_operator,
            scheme=args.scheme,
            coarsest=args.coarsest,
        ),
        dtype=args.dtype,
        backend=args.backend,
        precision=args.precision,
        tol=args.tol,
        max_cycles=max(args.cycles, 1),
    )
    mesh = None
    if args.mesh:
        from pde_multigrid_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)

    t_start = time.time()
    solver = MultigridSolver(problem, args.n, cfg, mesh=mesh)
    levels = None
    if args.resume:
        from pde_multigrid_tpu.utils.checkpointing import load_levels

        levels, meta = load_levels(args.resume, solver)
        print(f"resumed from {args.resume}: {meta}", file=sys.stderr)

    # multi-host: file outputs and the summary print belong to process 0
    # only (all processes would otherwise race on the same paths)
    is_main = True
    if args.distributed:
        import jax

        is_main = jax.process_index() == 0

    metrics = (
        MetricsLogger(args.metrics) if args.metrics and is_main else None
    )
    import contextlib

    trace_cm = contextlib.nullcontext()
    if args.profile:
        import jax

        trace_cm = jax.profiler.trace(args.profile)
    with trace_cm:
        res = solver.solve_to_tolerance(levels=levels, metrics=metrics)
    if metrics:
        metrics.close()

    if (args.checkpoint or args.dump_v) and is_main:
        import dataclasses as _dc

        lv = solver.fresh_levels()
        lv = (_dc.replace(lv[0], v=res.v),) + lv[1:]
        if args.checkpoint:
            from pde_multigrid_tpu.utils.checkpointing import save_levels

            save_levels(
                args.checkpoint, lv, meta={"cycles_run": res.cycles_run}
            )
        if args.dump_v:
            from pde_multigrid_tpu.utils.gridlog import dump_grid_v

            dump_grid_v(
                args.dump_v,
                lv[0],
                solver.geoms[0],
                problem,
                max_points=100000,
            )

    if not is_main:
        return
    print(
        json.dumps(
            {
                "problem": problem.name,
                "n": args.n,
                "cycle": dataclass_dict(cfg.cycle),
                "cycles_run": res.cycles_run,
                "residual_l2": res.residual_l2,
                "residual_history": res.residual_history,
                "error_l2": res.error_l2,
                "error_linf": res.error_linf,
                "error_mae": res.error_mae,
                "diverged": res.diverged,
                "wall_time_s": round(res.wall_time_s, 4),
                "compile_time_s": round(res.compile_time_s, 2),
            }
        )
    )
    # reference-style footer (Poisson3DSolver.cpp:44-46)
    print(f"finestGridSize: {args.n}", file=sys.stderr)
    print(
        f"Used {res.wall_time_s:0.2f} seconds of device time.",
        file=sys.stderr,
    )
    print(
        f"Finished in about {time.time() - t_start:.0f} seconds.",
        file=sys.stderr,
    )


def dataclass_dict(dc):
    import dataclasses

    return dataclasses.asdict(dc)


if __name__ == "__main__":
    main()

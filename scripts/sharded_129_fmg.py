"""End-to-end sharded 129^3 FMG equality vs the single-device solver on
the 8-virtual-device CPU mesh (VERDICT r3 #9: the largest multi-chip
correctness artifact this environment can produce — a deeper
agglomeration cut than the 33^3/65^3 tests: the 129^3 and 65^3 levels
shard, everything below agglomerates/replicates).

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        PDE_MG_SHARD_TIMESKEW=0 python scripts/sharded_129_fmg.py

PDE_MG_SHARD_TIMESKEW=0 keeps the per-shard chunks on the masked-block
engine: the time-skew wavefront's interpret mode walks XE+2T sequential
plane steps and is prohibitively slow at this size on CPU (the wavefront
engine's correctness is pinned separately and bitwise by
tests/test_parallel.py::test_sharded_timeskew_bitwise_in_tier).

Committed output (2026-08-20, verbatim; ~26 s wall; also runs as
tests/test_parallel.py::test_sharded_fmg_129_matches_single_device):
    levels: [(128, 128, 128), (64, 64, 64), (32, 32, 32), (16, 16, 16),
             (8, 8, 8), (4, 4, 4), (2, 2, 2)]
    sharded levels: [0, 1, 2]
    single:  res_l2=1.973e-03 err_linf=3.123e-05
    sharded: res_l2=1.973e-03 err_linf=3.123e-05
    max |sharded - single| = 0.00e+00
    OK
"""

import os

os.environ.setdefault("PDE_MG_SHARD_TIMESKEW", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    SolverConfig,
)
from pde_multigrid_tpu.parallel import mesh as pmesh


def main():
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2),
        max_cycles=2,
        tol=0.0,
        pad_axis0_to=8,
    )
    single = MultigridSolver(Poisson(3), 129, cfg)
    geoms = single.geoms
    print("levels:", [g.padded_shape for g in geoms], flush=True)
    r_single = single.solve_to_tolerance()
    assert not r_single.diverged

    mesh = pmesh.make_mesh(8)
    sharded = MultigridSolver(Poisson(3), 129, cfg, mesh=mesh)
    shard_lvls = [
        l
        for l, g in enumerate(geoms)
        if not pmesh.level_sharding(mesh, g).is_fully_replicated
    ]
    print("sharded levels:", shard_lvls, flush=True)
    assert shard_lvls, "nothing sharded — the test would be vacuous"
    r_sharded = sharded.solve_to_tolerance()
    assert not r_sharded.diverged

    print(
        f"single:  res_l2={r_single.residual_l2:.3e} "
        f"err_linf={r_single.error_linf:.3e}"
    )
    print(
        f"sharded: res_l2={r_sharded.residual_l2:.3e} "
        f"err_linf={r_sharded.error_linf:.3e}"
    )
    a, b = np.asarray(r_sharded.v), np.asarray(r_single.v)
    print(f"max |sharded - single| = {np.abs(a - b).max():.2e}")
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    print("OK")


if __name__ == "__main__":
    main()

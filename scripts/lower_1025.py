"""1025^3 sharded-FMG feasibility artifact (BASELINE.json config 4,
VERDICT r2 #7): AOT-lower the FULL sharded FMG step for 3D Poisson
1025^3 over an 8-device mesh WITHOUT materializing any arrays
(jax.eval_shape levels + sharded ShapeDtypeStructs), then

  * count the collective ops in the lowered HLO (the executable check of
    SCALING.md's communication model: one ppermute pair per direction
    per T-sweep chunk + one per leg for f, psum for norms);
  * report per-shard HBM bytes per level from the shardings (the memory-
    feasibility number for a v5p-16's 96 GB/chip).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/lower_1025.py [n] [n_devices]
"""

import re
import sys

import jax
import jax.numpy as jnp

from pde_multigrid_tpu import CycleConfig, Poisson3D
from pde_multigrid_tpu.cycles import CycleProgram
from pde_multigrid_tpu.grid import build_geometries
from pde_multigrid_tpu.parallel import mesh as pmesh
from pde_multigrid_tpu.parallel.sharded import ShardedKernels


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1025
    ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    problem = Poisson3D()
    mesh = pmesh.make_mesh(ndev)
    # production storage for this problem: wrap (homogeneous Dirichlet),
    # axis-0 padded to the mesh size (solver.py does the same)
    geoms = build_geometries(
        (n,) * 3,
        problem.domain,
        None,
        pad_axis0_to=ndev,
        pad_last_to=1,
        pad_sublane_to=1,
        wrap=True,
    )
    cycle = CycleConfig("fmg", 1, 2, 2)
    kernels = ShardedKernels(
        problem, geoms, mesh, smoother=cycle.smoother,
        sweeps_per_exchange=4,
    )
    program = CycleProgram(problem, geoms, cycle, kernels)

    # abstract levels: the shapes/dtypes of init_level's output with each
    # level's production sharding attached — no array is ever built
    def abstract_level(g):
        lvl = jax.eval_shape(lambda: problem.init_level(g, jnp.float32))
        s = pmesh.level_sharding(mesh, g)
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            lvl,
        )

    levels = tuple(abstract_level(g) for g in geoms)
    with mesh:
        lowered = jax.jit(program.solve_step).lower(levels)
    hlo = lowered.as_text()

    # -- collective census ---------------------------------------------------
    counts = {
        "collective_permute": len(
            re.findall(r"collective_permute|ppermute", hlo)
        ),
        "all_reduce/psum": len(re.findall(r"all_reduce|psum", hlo)),
        "all_gather": len(re.findall(r"all_gather", hlo)),
        "while_loops": len(re.findall(r"stablehlo\.while|while\(", hlo)),
    }
    print(f"[lower1025] n={n} devices={ndev} levels={len(geoms)}")
    print(f"[lower1025] HLO ops: {counts}")

    # -- per-shard memory model ----------------------------------------------
    total_shard = 0.0
    n_arrays = 4  # v, f + ~2 live temporaries (residual, error) per level
    for l, g in enumerate(geoms):
        s = pmesh.level_sharding(mesh, g)
        pts = 1
        for d in g.padded_shape:
            pts *= d
        frac = 1.0 / ndev if not s.is_fully_replicated else 1.0
        per_shard = pts * 4 * frac
        total_shard += per_shard * n_arrays
        print(
            f"[lower1025] L{l} {'x'.join(map(str, g.padded_shape))} "
            f"{'sharded/8' if frac < 1 else 'replicated'} "
            f"{per_shard * n_arrays / 2**30:.3f} GiB/shard"
        )
    print(
        f"[lower1025] total ~{total_shard / 2**30:.2f} GiB/shard "
        f"(v, f + 2 temporaries per level) — v5p HBM is 96 GiB/chip"
    )
    # optional: backend compile + XLA's own memory analysis (heavy on CPU)
    if "--compile" in sys.argv:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"[lower1025] memory_analysis: {ma}")


if __name__ == "__main__":
    main()

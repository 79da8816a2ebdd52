"""Sharded kernel tier: explicit halo-exchange relaxation on sharded
levels, jnp/GSPMD everywhere else (transfer ops and replicated coarse
levels — coarse-level agglomeration is expressed by the sharding layout
itself, see parallel/mesh.py)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from pde_multigrid_tpu.cycles import JnpKernels
from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.parallel import halo
from pde_multigrid_tpu.parallel.mesh import SHARD_AXIS, level_sharding


class ShardedKernels(JnpKernels):
    """JnpKernels with shard_map+ppermute relaxation on sharded levels.

    Only the RBGS smoother has an explicit sharded implementation (it is
    the hot path and the reference smoother); other smoothers fall back to
    the GSPMD-partitioned jnp tier, which is still correct and distributed
    (XLA inserts the halo collectives itself)."""

    def __init__(
        self,
        problem,
        geoms: Sequence[LevelGeometry],
        mesh,
        dtype=jnp.float32,
        smoother: str = "rbgs",
        omega: float = 1.0,
        sweeps_per_exchange: int = 1,
    ):
        super().__init__(problem, geoms, smoother, omega)
        self.mesh = mesh
        self._sharded_relax = []
        n = mesh.shape[SHARD_AXIS]
        for g in geoms:
            fn = None
            if smoother == "rbgs" and not level_sharding(
                mesh, g
            ).is_fully_replicated:
                x_loc = g.padded_shape[0] // n
                # clamp the chunk size to what the shard can host: each
                # sweep consumes 2 halo rows, so a shard of x_loc rows
                # supports at most x_loc // 2 sweeps per exchange
                t_eff = min(sweeps_per_exchange, x_loc // 2)
                if t_eff >= 1:
                    fn = halo.make_sharded_relax(
                        problem,
                        g,
                        mesh,
                        jnp.dtype(dtype),
                        t_eff,
                    )
            self._sharded_relax.append(fn)

    def relax(self, l, v, f, aux, nsweeps, f_zero=False):
        fn = self._sharded_relax[l]
        if fn is None:
            return super().relax(l, v, f, aux, nsweeps)
        return fn(v, f, nsweeps)

"""Sharded kernel tier: explicit halo-exchange relaxation on sharded
levels, jnp/GSPMD everywhere else (transfer ops and replicated coarse
levels — coarse-level agglomeration is expressed by the sharding layout
itself, see parallel/mesh.py).

Round-5 (VERDICT r4 #6/#7):
  * every op output is pinned to its level's sharding with
    `with_sharding_constraint`.  Without the pins, GSPMD propagation
    invented shardings like {devices=[4,2,1]} for REPLICATED coarse-level
    intermediates inside the jnp transfer path (the `_subsample2`
    reshapes), falling back to "involuntary full rematerialization" —
    harmless on 3^d-point tensors, catastrophic if it ever hit a sharded
    level array.  MULTICHIP_r04's warning tail is this; the pins remove it.
  * big wrap-3D and non-wrap-2D level pairs route restrict/prolong
    through the XLA MXU pick-matrix transfers (ops/pallas/transfer.py) —
    pure XLA contractions along the UNSHARDED axes, so they partition
    cleanly along the sharded axis 0 (the x-axis stage is rolls + a
    major-dim reshape, which GSPMD handles with collective-permutes);
    parity vs the jnp tier on the virtual mesh is pinned by
    tests/test_parallel.py::test_sharded_xla_transfers_match_jnp.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from pde_multigrid_tpu.cycles import JnpKernels
from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.parallel import halo
from pde_multigrid_tpu.parallel.mesh import SHARD_AXIS, level_sharding

# sharded-tier 3D engagement floor for the XLA MXU transfers (padded
# min(Y, Z)): 256 keeps 129^3 on the jnp tier (bitwise match with the
# single-device solver) while 257^3-and-up pairs get the MXU path
SHARDED_XLA3D_MIN_YZ = 256


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
        # XLA MXU pick-matrix transfers on qualifying pairs (shardable by
        # construction: pure XLA einsums along unsharded axes).  The 3D
        # gate is raised above the single-chip tier's (257^3-class and
        # up): at 129^3 the jnp transfers are cheap and keeping them
        # preserves the sharded-FMG == single-device bitwise match
        # (scripts/sharded_129_fmg.py) — the XLA contractions reassociate
        # f32 sums.
        from pde_multigrid_tpu.ops.pallas import transfer as transfer_mod

        nlev = len(self.geoms)
        self._xla_restrict = [None] * nlev
        self._xla_prolong = [None] * nlev
        for l in range(nlev - 1):
            gf, gc = self.geoms[l], self.geoms[l + 1]
            if transfer_mod.xla_pair_ok(gf, gc) and (
                min(gf.padded_shape[1:]) >= SHARDED_XLA3D_MIN_YZ
            ):
                self._xla_restrict[l] = transfer_mod.make_xla_restrict(
                    gf, gc, jnp.dtype(dtype)
                )
                self._xla_prolong[l] = transfer_mod.make_xla_prolong(
                    gc, gf, jnp.dtype(dtype)
                )
            elif transfer_mod.xla_pair_ok_2d(gf, gc):
                self._xla_restrict[l] = (
                    transfer_mod.make_xla_restrict_2d(
                        gf, gc, jnp.dtype(dtype),
                        edge_injection=not hasattr(
                            problem, "kernel_keep_mask"
                        ),
                    )
                )
                self._xla_prolong[l] = transfer_mod.make_xla_prolong_2d(
                    gc, gf, jnp.dtype(dtype)
                )

    def _pin(self, arr, l: int):
        """Constrain an op output to level l's sharding (sharded axis-0
        on big levels, fully replicated on agglomerated ones)."""
        return jax.lax.with_sharding_constraint(
            arr, level_sharding(self.mesh, self.geoms[l])
        )

    def relax(self, l, v, f, aux, nsweeps, f_zero=False):
        fn = self._sharded_relax[l]
        if fn is None:
            return self._pin(super().relax(l, v, f, aux, nsweeps), l)
        return fn(v, f, nsweeps)

    def residual(self, l, v, f, aux):
        return self._pin(super().residual(l, v, f, aux), l)

    def restrict(self, l_fine, arr, m_int_coarse, m_log_coarse):
        fn = self._xla_restrict[l_fine]
        if fn is not None:
            out = fn(arr, m_int_coarse, m_log_coarse)
        else:
            out = super().restrict(
                l_fine, arr, m_int_coarse, m_log_coarse
            )
        return self._pin(out, l_fine + 1)

    def prolong(self, l_fine, arr):
        fn = self._xla_prolong[l_fine]
        if fn is not None:
            out = fn(arr)
        else:
            out = super().prolong(l_fine, arr)
        return self._pin(out, l_fine)

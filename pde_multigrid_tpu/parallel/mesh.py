"""Mesh construction + level shardings (spatial domain decomposition).

The decomposition follows the thesis's multi-GPU sketch made real
(SURVEY.md §2.6, §5): each grid level is sharded along axis 0 (rows in
1D/2D, x-planes in 3D) across the device mesh; levels too small to shard
profitably are *agglomerated* — fully replicated so the coarse solve runs
redundantly on every chip with zero communication (cheaper than scattering
3^d-point grids).

Two execution paths use these shardings:
  * the GSPMD path (this module + plain jit): annotate level shardings and
    let XLA partition the stencil ops, inserting halo collectives itself —
    used by the dryrun/compile-check and as the correctness baseline;
  * the explicit path (parallel/halo.py, shard_map + ppermute) — the
    performance path with hand-scheduled one-cell halo exchanges.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pde_multigrid_tpu.grid import Level, LevelGeometry

SHARD_AXIS = "x"  # grid axis 0 is sharded over this mesh axis


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def min_shardable_extent(n_shards: int, halo: int = 1) -> int:
    """Smallest axis-0 extent worth sharding: every shard must own at least
    one interior plane beyond its halos."""
    return n_shards * (2 * halo + 1)


def level_sharding(
    mesh: Mesh, geom: LevelGeometry, halo: int = 1
) -> NamedSharding:
    """Sharding for one level's field arrays: axis 0 sharded when large
    enough, otherwise fully replicated (coarse-level agglomeration)."""
    n = mesh.shape[SHARD_AXIS]
    if (
        geom.shape[0] >= min_shardable_extent(n, halo)
        and geom.padded_shape[0] % n == 0
    ):
        spec = P(SHARD_AXIS, *([None] * (geom.ndim - 1)))
    else:
        spec = P(*([None] * geom.ndim))
    return NamedSharding(mesh, spec)


def _put(arr, s: NamedSharding):
    """Place `arr` (host-replicated logical value) with sharding `s`.

    Multi-host (mesh spans processes, SURVEY.md §5 "multi-host via
    jax.distributed"): every process holds the same logical array — init
    is deterministic — and contributes its addressable shards via
    make_array_from_callback; device_put would reject non-addressable
    devices."""
    if s.is_fully_addressable:
        return jax.device_put(arr, s)
    host = np.asarray(arr)
    return jax.make_array_from_callback(
        host.shape, s, lambda idx: host[idx]
    )


def shard_levels(mesh: Mesh, levels, geoms, halo: int = 1):
    """Place each level's arrays with its level sharding."""
    out = []
    for lvl, g in zip(levels, geoms):
        s = level_sharding(mesh, g, halo)
        out.append(
            Level(
                v=_put(lvl.v, s),
                f=_put(lvl.f, s),
                aux={k: _put(a, s) for k, a in lvl.aux.items()},
            )
        )
    return tuple(out)

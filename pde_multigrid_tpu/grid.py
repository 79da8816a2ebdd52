"""Grid hierarchy: levels, geometry, and construction.

Reference parity (SURVEY.md §2.4): grids have N = 2^k + 1 points per axis
(all axes equal in the reference; we allow per-axis sizes as long as each is
2^k + 1 with a common k floor), `num_levels = log2(N - 1)` so the coarsest
grid has 3 points per axis (one interior point), and the coarse-size
recurrence is `(fine - 1) // 2 + 1`.  Each level owns exactly two persistent
arrays, `v` (solution / error) and `f` (RHS / restricted residual) — cf.
reference `Grid3D.h:4-39`, `MultiGrid1D.cpp:21-28`.

TPU-first design notes:
  * `Level` is a registered-dataclass pytree so whole hierarchies flow
    through `jax.jit` / `shard_map` as arguments (donatable, shardable).
  * Geometry (shapes, spacings, domain) is *static* Python data — shapes
    must be compile-time constants for XLA; one trace specializes per
    hierarchy, which is exactly one compilation per (problem, finest shape).
  * Boundary masks / checkerboard parity masks are precomputed per level as
    on-device arrays in `Level.aux` (problem-specific coefficient fields
    also live there), so the hot relaxation loop is pure vector math.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["v", "f", "aux"],
    meta_fields=[],
)
@dataclasses.dataclass
class Level:
    """One multigrid level: solution/error `v`, RHS/residual `f`, and
    precomputed per-level constant fields `aux` (masks, coefficients)."""

    v: Array
    f: Array
    aux: dict[str, Array]

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.v.shape)


@dataclasses.dataclass(frozen=True)
class LevelGeometry:
    """Static geometry of one level. Hashable: safe to close over in jit."""

    shape: tuple[int, ...]  # points per axis, each 2^k + 1
    spacing: tuple[float, ...]  # h per axis
    origin: tuple[float, ...]  # coordinate of index 0 per axis
    domain: tuple[tuple[float, float], ...]  # (lo, hi) per axis

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def coords1d(self, axis: int, dtype=jnp.float32) -> Array:
        """Coordinates along one axis: origin + i*h.

        Computed in float32 to match the reference's `x_a + posX*h_x`
        (e.g. Grid3D.cpp:84-92) rounding behavior.
        """
        n = self.shape[axis]
        i = jnp.arange(n, dtype=dtype)
        return jnp.asarray(self.origin[axis], dtype) + i * jnp.asarray(
            self.spacing[axis], dtype
        )

    def coords(self, dtype=jnp.float32) -> tuple[Array, ...]:
        """Broadcastable coordinate arrays (meshgrid, 'ij' indexing)."""
        axes = [self.coords1d(a, dtype) for a in range(self.ndim)]
        return tuple(jnp.meshgrid(*axes, indexing="ij"))


def check_grid_size(n: int) -> int:
    """Assert n = 2^k + 1 (reference Grid1D.cpp:7) and return k."""
    if n < 3 or (n - 1) & (n - 2):
        raise ValueError(f"grid size must be 2^k + 1 with k >= 1, got {n}")
    return int(math.log2(n - 1))


def coarsen_shape(shape: tuple[int, ...]) -> tuple[int, ...]:
    """Coarse-size recurrence ((fine-1)/2)+1 (reference MultiGrid1D.cpp:28)."""
    return tuple((n - 1) // 2 + 1 for n in shape)


def num_levels_for(shape: tuple[int, ...]) -> int:
    """numGrids = log2(N-1) for the smallest axis: one level per factor of 2
    down to 3 points (1 interior point) — reference MultiGrid1D.cpp:21-22."""
    return min(check_grid_size(n) for n in shape)


def build_geometries(
    shape: tuple[int, ...],
    domain: tuple[tuple[float, float], ...],
    num_levels: int | None = None,
) -> tuple[LevelGeometry, ...]:
    """Geometry for every level, finest first."""
    ndim = len(shape)
    if len(domain) != ndim:
        raise ValueError("domain rank must match shape rank")
    for lo, hi in domain:
        if not hi > lo:
            raise ValueError(f"domain must satisfy hi > lo, got ({lo}, {hi})")
    levels = num_levels_for(shape) if num_levels is None else num_levels
    geoms = []
    cur = tuple(shape)
    for _ in range(levels):
        spacing = tuple(
            (hi - lo) / (n - 1) for (lo, hi), n in zip(domain, cur)
        )
        geoms.append(
            LevelGeometry(
                shape=cur,
                spacing=spacing,
                origin=tuple(lo for lo, _ in domain),
                domain=tuple(domain),
            )
        )
        cur = coarsen_shape(cur)
    return tuple(geoms)


def interior_mask(shape: tuple[int, ...]) -> np.ndarray:
    """Boolean mask of interior (non-boundary) points."""
    m = np.ones(shape, dtype=bool)
    for ax in range(len(shape)):
        idx_lo = [slice(None)] * len(shape)
        idx_hi = [slice(None)] * len(shape)
        idx_lo[ax] = 0
        idx_hi[ax] = shape[ax] - 1
        m[tuple(idx_lo)] = False
        m[tuple(idx_hi)] = False
    return m


def parity_mask(shape: tuple[int, ...], color: int) -> np.ndarray:
    """Checkerboard mask: True where (sum of indices) % 2 == color.

    color 0 = the reference's "punti pari" (red) updated first, color 1 =
    odd/black (e.g. MultiGrid3D.cpp:515,544)."""
    grids = np.indices(shape).sum(axis=0)
    return (grids % 2) == color


def base_aux(geom: LevelGeometry, dtype=jnp.float32) -> dict[str, Array]:
    """Masks shared by every problem, as device arrays.

    Masks are stored in the compute dtype (1.0 / 0.0) rather than bool:
    the relaxation inner loop is then pure f32 VPU math
    (v' = v + mask*(update - v)) with no select lowering surprises.
    """
    interior = interior_mask(geom.shape)
    red = parity_mask(geom.shape, 0)
    return {
        "m_red": jnp.asarray(interior & red, dtype),
        "m_black": jnp.asarray(interior & ~red, dtype),
        "m_int": jnp.asarray(interior, dtype),
    }


@dataclasses.dataclass
class Hierarchy:
    """A full multigrid hierarchy: static geometries + device-side levels.

    `levels[0]` is the finest. Construction mirrors the reference ctor chain
    MultiGridND -> InitGrids -> GridND ctor -> InitV/InitF (SURVEY.md §3.3):
    every level is initialized with the problem's analytic boundary data and
    RHS at its own resolution; coarse `f` is later overwritten by restriction.
    """

    problem: Any
    geoms: tuple[LevelGeometry, ...]
    levels: list[Level]

    @classmethod
    def build(
        cls,
        problem,
        shape: tuple[int, ...] | int,
        num_levels: int | None = None,
        dtype=jnp.float32,
    ) -> "Hierarchy":
        if isinstance(shape, int):
            shape = (shape,) * problem.ndim
        if len(shape) != problem.ndim:
            raise ValueError(
                f"shape rank {len(shape)} != problem ndim {problem.ndim}"
            )
        geoms = build_geometries(shape, problem.domain, num_levels)
        levels = [problem.init_level(g, dtype=dtype) for g in geoms]
        return cls(problem=problem, geoms=geoms, levels=levels)

    @property
    def num_levels(self) -> int:
        return len(self.geoms)

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
    """Static geometry of one level. Hashable: safe to close over in jit.

    `shape` is the *logical* grid (2^k + 1 points per axis, reference
    semantics); `padded_shape` is the physical array shape.  TPU-first
    storage: logical sizes 2^k+1 are hostile to both lane tiling (last axis
    wants multiples of 128) and mesh sharding (axis 0 wants divisibility by
    the device count), so arrays may carry trailing padding.  Padding is
    inert by construction: masks (`m_log`, `m_int`, colors) are zero there,
    every op is mask-gated, and coefficient fields are built from clamped
    coordinates so padded entries stay finite.
    """

    shape: tuple[int, ...]  # logical points per axis, each 2^k + 1
    spacing: tuple[float, ...]  # h per axis
    origin: tuple[float, ...]  # coordinate of index 0 per axis
    domain: tuple[tuple[float, float], ...]  # (lo, hi) per axis
    padded_shape: tuple[int, ...] = None  # physical array shape
    # wrap storage (homogeneous-Dirichlet problems only): store N-1 = 2^k
    # points per axis — the zero boundary plane at index 0 serves BOTH
    # domain ends, because a circular shift (jnp.roll) wraps the +1
    # neighbor of the last stored interior plane (logical N-2) around to
    # plane 0 = the zero boundary value.  Perfect lane/sublane alignment,
    # zero padding waste, and every roll-based op is correct as-is.
    wrap: bool = False

    def __post_init__(self):
        if self.padded_shape is None:
            object.__setattr__(self, "padded_shape", self.stored_shape)
        for p, s in zip(self.padded_shape, self.stored_shape):
            if p < s:
                raise ValueError("padded_shape must cover stored shape")
        if self.wrap and self.padded_shape != self.stored_shape:
            raise ValueError("wrap storage must be padding-free")

    @property
    def stored_shape(self) -> tuple[int, ...]:
        """Points physically stored per axis (logical minus the duplicate
        upper boundary plane in wrap mode)."""
        if self.wrap:
            return tuple(n - 1 for n in self.shape)
        return self.shape

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def coords1d(self, axis: int, dtype=jnp.float32) -> Array:
        """Coordinates along one axis: origin + i*h, clamped to the domain
        (padded tail rows repeat the upper bound so coefficient fields stay
        finite there).

        Computed in float32 to match the reference's `x_a + posX*h_x`
        (e.g. Grid3D.cpp:84-92) rounding behavior.
        """
        n = self.padded_shape[axis]
        lo, hi = self.domain[axis]
        i = jnp.arange(n, dtype=dtype)
        x = jnp.asarray(self.origin[axis], dtype) + i * jnp.asarray(
            self.spacing[axis], dtype
        )
        return jnp.clip(x, min(lo, hi), max(lo, hi))

    def coords(self, dtype=jnp.float32) -> tuple[Array, ...]:
        """Broadcastable coordinate arrays (meshgrid, 'ij' indexing), at
        the padded shape."""
        axes = [self.coords1d(a, dtype) for a in range(self.ndim)]
        return tuple(jnp.meshgrid(*axes, indexing="ij"))


def to_logical(arr, geom: LevelGeometry) -> np.ndarray:
    """View a stored array at the logical reference shape (2^k+1 per axis):
    strip physical padding, and in wrap mode re-append the upper boundary
    plane (zero — wrap implies homogeneous Dirichlet data)."""
    a = np.asarray(arr)[tuple(slice(0, s) for s in geom.stored_shape)]
    if geom.wrap:
        a = np.pad(a, [(0, 1)] * geom.ndim)
    return a


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


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def build_geometries(
    shape: tuple[int, ...],
    domain: tuple[tuple[float, float], ...],
    num_levels: int | None = None,
    pad_axis0_to: int = 1,
    pad_last_to: int = 1,
    pad_sublane_to: int = 1,
    wrap: bool = False,
) -> tuple[LevelGeometry, ...]:
    """Geometry for every level, finest first.

    pad_axis0_to: round the physical axis-0 extent up to this multiple
    (device-mesh divisibility for spatial sharding).
    pad_last_to: round the physical last-axis extent up to this multiple
    (TPU lane alignment, typically 128).
    pad_sublane_to: round the physical second-to-last-axis extent up to
    this multiple (TPU sublane alignment, typically 8) — required by the
    Pallas kernel tier so HBM DMA slices land on tile boundaries.
    """
    ndim = len(shape)
    if len(domain) != ndim:
        raise ValueError("domain rank must match shape rank")
    for lo, hi in domain:
        if not hi > lo:
            raise ValueError(f"domain must satisfy hi > lo, got ({lo}, {hi})")
    levels = num_levels_for(shape) if num_levels is None else num_levels

    def padded_for(cur: tuple[int, ...], use_wrap: bool):
        stored = [n - 1 for n in cur] if use_wrap else list(cur)
        padded = list(stored)
        if use_wrap:
            # 2^k stored sizes: already lane/sublane aligned wherever the
            # slab kernel needs it (big levels); only mesh divisibility is
            # applied, and only on levels fat enough to shard.
            if stored[0] >= 3 * pad_axis0_to:
                padded[0] = _round_up(padded[0], pad_axis0_to)
            return stored, padded
        if ndim == 1:
            padded[0] = _round_up(
                padded[0], math.lcm(pad_axis0_to, pad_last_to)
            )
        else:
            m0 = pad_axis0_to if stored[0] >= 3 * pad_axis0_to else 1
            if ndim == 2:  # axis 0 is also the sublane axis
                m0 = math.lcm(m0, pad_sublane_to)
            padded[0] = _round_up(padded[0], m0)
            padded[-1] = _round_up(padded[-1], pad_last_to)
            for d in range(1, ndim - 1):
                padded[d] = _round_up(padded[d], pad_sublane_to)
        return stored, padded

    # wrap is all-or-nothing across the hierarchy (transfer ops assume a
    # consistent storage convention): disable it if any level's padding
    # requirement is incompatible (e.g. non-power-of-two mesh size)
    if wrap:
        cur = tuple(shape)
        for _ in range(levels):
            stored, padded = padded_for(cur, True)
            if stored != padded:
                wrap = False
                break
            cur = coarsen_shape(cur)

    geoms = []
    cur = tuple(shape)
    for _ in range(levels):
        spacing = tuple(
            (hi - lo) / (n - 1) for (lo, hi), n in zip(domain, cur)
        )
        _, padded = padded_for(cur, wrap)
        geoms.append(
            LevelGeometry(
                shape=cur,
                spacing=spacing,
                origin=tuple(lo for lo, _ in domain),
                domain=tuple(domain),
                padded_shape=tuple(padded),
                wrap=wrap,
            )
        )
        cur = coarsen_shape(cur)
    return tuple(geoms)


def _pad_to(m: np.ndarray, padded_shape: tuple[int, ...]) -> np.ndarray:
    """Zero/False-pad a logical-shape mask out to the physical shape."""
    if tuple(m.shape) == tuple(padded_shape):
        return m
    out = np.zeros(padded_shape, dtype=m.dtype)
    out[tuple(slice(0, s) for s in m.shape)] = m
    return out


def logical_mask(
    shape: tuple[int, ...], padded_shape: tuple[int, ...] | None = None
) -> np.ndarray:
    """Boolean mask of the logical (non-padding) region."""
    m = np.ones(shape, dtype=bool)
    return _pad_to(m, padded_shape or shape)


def interior_mask(
    shape: tuple[int, ...], padded_shape: tuple[int, ...] | None = None
) -> np.ndarray:
    """Boolean mask of interior (non-boundary, non-padding) points."""
    m = np.ones(shape, dtype=bool)
    for ax in range(len(shape)):
        idx_lo = [slice(None)] * len(shape)
        idx_hi = [slice(None)] * len(shape)
        idx_lo[ax] = 0
        idx_hi[ax] = shape[ax] - 1
        m[tuple(idx_lo)] = False
        m[tuple(idx_hi)] = False
    return _pad_to(m, padded_shape or shape)


def parity_mask(
    shape: tuple[int, ...],
    color: int,
    padded_shape: tuple[int, ...] | None = None,
) -> np.ndarray:
    """Checkerboard mask: True where (sum of indices) % 2 == color.

    color 0 = the reference's "punti pari" (red) updated first, color 1 =
    odd/black (e.g. MultiGrid3D.cpp:515,544)."""
    grids = np.indices(shape).sum(axis=0)
    return _pad_to((grids % 2) == color, padded_shape or shape)


def base_aux(geom: LevelGeometry, dtype=jnp.float32) -> dict[str, Array]:
    """Masks shared by every problem, as device arrays.

    Masks are stored in the compute dtype (1.0 / 0.0) rather than bool:
    the relaxation inner loop is then pure f32 VPU math
    (v' = v + mask*(update - v)) with no select lowering surprises.

    Wrap storage: stored index 0 per axis is the (zero) boundary plane and
    every other stored point is interior, so the interior mask excludes
    only index 0; parities are unchanged (stored index == logical index).
    """
    if geom.wrap:
        s = geom.stored_shape
        interior = np.ones(s, dtype=bool)
        for ax in range(len(s)):
            sl = [slice(None)] * len(s)
            sl[ax] = 0
            interior[tuple(sl)] = False
        red = parity_mask(s, 0)
        log = np.ones(s, dtype=bool)
    else:
        interior = interior_mask(geom.shape, geom.padded_shape)
        red = parity_mask(geom.shape, 0, geom.padded_shape)
        log = logical_mask(geom.shape, geom.padded_shape)
    return {
        "m_red": jnp.asarray(interior & red, dtype),
        "m_black": jnp.asarray(interior & ~red, dtype),
        "m_int": jnp.asarray(interior, dtype),
        "m_log": jnp.asarray(log, dtype),
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
        pad_axis0_to: int = 1,
        pad_last_to: int = 1,
        pad_sublane_to: int = 1,
        wrap: bool = False,
    ) -> "Hierarchy":
        if isinstance(shape, int):
            shape = (shape,) * problem.ndim
        if len(shape) != problem.ndim:
            raise ValueError(
                f"shape rank {len(shape)} != problem ndim {problem.ndim}"
            )
        geoms = build_geometries(
            shape,
            problem.domain,
            num_levels,
            pad_axis0_to=pad_axis0_to,
            pad_last_to=pad_last_to,
            pad_sublane_to=pad_sublane_to,
            wrap=wrap,
        )
        levels = [problem.init_level(g, dtype=dtype) for g in geoms]
        return cls(problem=problem, geoms=geoms, levels=levels)

    @property
    def num_levels(self) -> int:
        return len(self.geoms)

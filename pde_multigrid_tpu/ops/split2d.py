"""Persistent color-split execution for big non-wrap 2D levels.

Round 5 (VERDICT r4 #1): the 2D color-split slab kernel used to convert
dense <-> split around EVERY relax leg (~120 us x 2 per leg at 2049^2,
~4x that at 4097^2, KERNELS.md).  This module supplies split-layout
forms of the two ops between relax legs — residual+restrict and
prolong+blend — so a level's state can stay in the (X, Y/2) red/black
half layout across the whole cycle visit; dispatch.PallasKernels caches
the dense<->halves correspondence per trace and XLA dead-code-eliminates
every merge whose dense twin is never consumed.

Layout convention (== relax.make_split_color_slab_2d): q = x % 2, red
points of row x at y = 2j + q, black at y = 2j + 1 - q, halves lane-
padded to Y2p = round_up(Y/2, 128).  Key layout fact exploited here:
values at EVEN fine y sit at half-index j = y/2 of the q-dependent half
(even = where(q, black, red)), and odd y likewise — so the restriction
smoothing along y and the prolongation interleave along y are LANE-LOCAL
rolls + selects on the halves, with NO dense interleave gather at all.
Only the x-axis smooth+subsample / upsample crosses rows, and that runs
as one banded pick-matrix MXU contraction per op (transfer.py builders).

Reference ops: 2D CalculateResidual `MultiGrid2D.cpp:367-408`, Restrict
`:63-126`, Interpolate `:128-196`, ApplyCorrection `:343-366`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.ops.pallas import transfer as _transfer

Array = jax.Array


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def half_width(geom: LevelGeometry) -> int:
    return _round_up(geom.padded_shape[1] // 2, 128)


def _q1(X: int):
    g = lax.broadcasted_iota(jnp.int32, (X, 1), 0)
    return (g % 2) == 1


def _fit_lanes(a: Array, want: int) -> Array:
    have = a.shape[1]
    if have == want:
        return a
    if have > want:
        return a[:, :want]
    return jnp.pad(a, ((0, 0), (0, want - have)))


def color_coords(geom: LevelGeometry, dtype):
    """((x, y_red), (x, y_black)) physical coordinates of each color's
    points in half layout, domain-clamped exactly like
    LevelGeometry.coords1d / the split slab kernel's in-kernel coords."""
    X, Y = geom.padded_shape
    Y2p = half_width(geom)
    g = lax.broadcasted_iota(jnp.int32, (X, 1), 0)
    jj = lax.broadcasted_iota(jnp.int32, (1, Y2p), 1)
    qi = (g % 2).astype(jnp.int32)
    y_r = 2 * jj + qi
    y_b = 2 * jj + 1 - qi
    lo0, hi0 = geom.domain[0]
    lo1, hi1 = geom.domain[1]
    xf = jnp.clip(
        jnp.asarray(geom.origin[0], dtype)
        + g.astype(dtype) * jnp.asarray(geom.spacing[0], dtype),
        min(lo0, hi0),
        max(lo0, hi0),
    )

    def yf(yi):
        return jnp.clip(
            jnp.asarray(geom.origin[1], dtype)
            + yi.astype(dtype) * jnp.asarray(geom.spacing[1], dtype),
            min(lo1, hi1),
            max(lo1, hi1),
        )

    return (xf, yf(y_r)), (xf, yf(y_b)), (y_r, y_b)


def interior_masks_halves(geom: LevelGeometry, dtype):
    """(m_red, m_black) interior masks in half layout — the PURE
    geometric interior (callers gate keep-mask problems out)."""
    X, Y = geom.padded_shape
    nx, ny = geom.shape
    _, _, (y_r, y_b) = color_coords(geom, dtype)
    g = lax.broadcasted_iota(jnp.int32, (X, 1), 0)
    okx = (g >= 1) & (g <= nx - 2)
    m_r = ((y_r >= 1) & (y_r <= ny - 2) & okx).astype(dtype)
    m_b = ((y_b >= 1) & (y_b <= ny - 2) & okx).astype(dtype)
    return m_r, m_b


def _nbr_factory(other: Array, q1b):
    """Opposite-color neighbor access on full half arrays — the XLA
    mirror of the slab kernel's in-VMEM nbr callback (axis-0 rolls wrap
    onto masked boundary/padding rows, exactly like stencil._shift)."""

    def nbr(ax: int, off: int):
        if ax == 0:
            return jnp.roll(other, -off, axis=0)
        if off == +1:
            return jnp.where(q1b, jnp.roll(other, -1, axis=1), other)
        return jnp.where(q1b, other, jnp.roll(other, 1, axis=1))

    return nbr


def residual_halves(problem, geom: LevelGeometry, r, b, fr, fb, dtype):
    """(rr, rb) = split(m_int * (f - L v)) computed directly on halves
    via problem.split_operator2d; fr/fb None means f == 0."""
    X, Y = geom.padded_shape
    q1 = _q1(X)
    cr, cb, _ = color_coords(geom, dtype)
    m_r, m_b = interior_masks_halves(geom, dtype)
    Lr = problem.split_operator2d(r, _nbr_factory(b, q1), cr, geom)
    Lb = problem.split_operator2d(
        b, _nbr_factory(r, jnp.logical_not(q1)), cb, geom
    )
    rr = m_r * ((-Lr) if fr is None else (fr - Lr))
    rb_ = m_b * ((-Lb) if fb is None else (fb - Lb))
    return rr, rb_


def restrict_residual_from_halves(
    geom_f: LevelGeometry,
    geom_c: LevelGeometry,
    rr: Array,
    rb: Array,
    m_int_c,
    m_log_c,
):
    """Full-weighting restriction of an interior-masked (residual-like)
    field given in halves, to the DENSE coarse array.

    Because the field vanishes on the fine boundary, the coarse-boundary
    injection is identically zero and the jnp tier's blend
    `inj + m_int*(sm - inj)` collapses to `m_int * sm` — no injection
    pass at all.  y-smoothing is lane-local on the halves (even/odd
    extraction is one select each); only the x smooth+subsample runs as
    an MXU pick contraction."""
    X, Y = geom_f.padded_shape
    Xc, Yc = geom_c.padded_shape
    nfx, _ = geom_f.shape
    q1 = _q1(X)
    even = jnp.where(q1, rb, rr)  # fine y = 2j
    odd = jnp.where(q1, rr, rb)  # fine y = 2j + 1
    # sm_y[x, jc] = 1/4 f[2jc-1] + 1/2 f[2jc] + 1/4 f[2jc+1]
    sm_y = 0.5 * even + 0.25 * (odd + jnp.roll(odd, 1, axis=1))
    Rx = _transfer._restrict_mat_open(nfx, X, Xc)
    sm = _transfer._hilo_einsum("xc,xj->cj", Rx, sm_y)
    out = _fit_lanes(sm, Yc) * m_int_c
    if m_log_c is not None:
        out = out * m_log_c
    return out


def prolong_blend_halves(
    geom_c: LevelGeometry,
    geom_f: LevelGeometry,
    c: Array,
    r: Array,
    b: Array,
    mode: str,
    dtype,
):
    """Bilinear prolongation of the dense coarse array blended into the
    fine halves on the interior:

      mode='add':     h' = h + m * up(c)        (coarse-grid correction)
      mode='replace': h' = h + m * (up(c) - h)  (FMG solution transfer)

    x-upsample is one MXU pick contraction to fine rows; the y-side
    even/odd values are lane-local (odd = averaged lane neighbors), and
    the color interleave is one select per half."""
    assert mode in ("add", "replace")
    X, Y = geom_f.padded_shape
    Xc, Yc = geom_c.padded_shape
    ncx, _ = geom_c.shape
    Y2p = half_width(geom_f)
    Px = _transfer._prolong_mat_open(ncx, Xc, X)
    cy = _transfer._hilo_einsum("cx,cd->xd", Px, c)  # (X, Yc)
    cy = _fit_lanes(cy, Y2p)
    up_even = cy  # fine y = 2j <- coarse j
    up_odd = 0.5 * (cy + jnp.roll(cy, -1, axis=1))  # y = 2j+1
    q1 = _q1(X)
    up_r = jnp.where(q1, up_odd, up_even)
    up_b = jnp.where(q1, up_even, up_odd)
    m_r, m_b = interior_masks_halves(geom_f, dtype)
    if mode == "add":
        return r + m_r * up_r, b + m_b * up_b
    return r + m_r * (up_r - r), b + m_b * (up_b - b)

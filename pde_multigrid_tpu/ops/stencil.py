"""The six core multigrid ops, dimension-generic, as pure-jnp reference
implementations (SURVEY.md §2.2: Relax / CalculateResidual / Restrict /
Interpolate / ApplyCorrection / Set).

Design (TPU-first, not a CUDA port):
  * Red-black Gauss-Seidel is two masked whole-array updates per sweep —
    mathematically identical to the reference's two colored loops
    (MultiGrid3D.cpp:489-567) and race-free by construction (the reference's
    CUDA kernels have a cross-block race here, SURVEY.md §2.7.1).
  * Restriction is the separable tensor-product of the 1D full-weighting
    stencil [1/4, 1/2, 1/4] evaluated at even fine points, which expands to
    exactly the reference's 9-point (1/16 [1,2,1;2,4,2;1,2,1],
    MultiGrid2D.cpp:123) and 27-point (weights 1/8,1/16,1/32,1/64,
    MultiGrid3D.cpp:180) kernels; coarse boundary = injection.
  * Prolongation is the separable per-axis linear upsample, expanding to
    the reference's parity-case bilinear/trilinear formulas
    (MultiGrid2D.cpp:128-196, MultiGrid3D.cpp:186-335); interior-only.
  * Sweep loops run under `lax.fori_loop` so a nu=3000 relax leg is ONE
    XLA dispatch, not 3000 kernel launches (the reference pays one launch
    plus a device->host memcpy per sweep, SURVEY.md §3.2).

Masks are float (1.0/0.0) fields from `grid.base_aux`; masked update is
`v + m*(upd - v)` — a fused multiply-add on the VPU.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def relax_rbgs(
    update_fn: Callable[[Array, Array], Array],
    v: Array,
    f: Array,
    m_red: Array,
    m_black: Array,
    nsweeps: int,
) -> Array:
    """`nsweeps` red-black Gauss-Seidel sweeps.

    `update_fn(v, f)` returns the pointwise local solve evaluated at all
    points; red (even-parity interior) points are written first, then black,
    matching the reference sweep order (MultiGrid1D.cpp:79-118).
    """

    def one_sweep(_, v):
        v = v + m_red * (update_fn(v, f) - v)
        v = v + m_black * (update_fn(v, f) - v)
        return v

    if nsweeps == 1:
        return one_sweep(0, v)
    return lax.fori_loop(0, nsweeps, one_sweep, v)


def relax_jacobi(
    update_fn: Callable[[Array, Array], Array],
    v: Array,
    f: Array,
    m_int: Array,
    omega: float,
    nsweeps: int,
) -> Array:
    """`nsweeps` damped (weighted) Jacobi sweeps: all interior points move
    simultaneously toward their local solve, scaled by omega (2/3 is the
    classic smoothing-optimal choice for the Laplacian).

    Extension beyond the reference (which implements red-black GS only);
    BASELINE.json config 1 names a V-cycle Jacobi run."""

    def one(_, v):
        return v + (omega * m_int) * (update_fn(v, f) - v)

    if nsweeps == 1:
        return one(0, v)
    return lax.fori_loop(0, nsweeps, one, v)


def thomas_tridiagonal(
    a_rows: Array, b_rows: Array, c_rows: Array, d: Array, axis: int
) -> Array:
    """Batched Thomas solve of tridiagonal systems along `axis`.

    a/b/c are per-row coefficient vectors (length = d.shape[axis]);
    rows with (a=0, b=1, c=0) are identity equations, which is how Dirichlet
    boundaries and physical padding are folded in: their d carries the
    current value and the recurrence automatically moves the boundary
    contribution into the neighboring interior rows.

    TPU-native shape: the scan is sequential along the line axis but each
    step is elementwise over all remaining axes — every line in the grid is
    solved simultaneously on the VPU.

    When a/b/c arrive as HOST (numpy) vectors — the line_system builders
    always supply them that way, since the tridiagonal couplings are
    per-row constants — the coefficient half of the recurrence is
    precomputed on the host in float64:

        cp_i    = c_i / (b_i - a_i cp_{i-1})          (host, once)
        alpha_i = -a_i / (b_i - a_i cp_{i-1})         (host, once)
        beta_i  =  1   / (b_i - a_i cp_{i-1})         (host, once)
        dp_i    = alpha_i dp_{i-1} + beta_i d_i       (device scan)
        x_i     = dp_i - cp_i x_{i+1}                 (device scan)

    so each device scan step is ONE fused multiply-add per point instead
    of two data-dependent divides + multiply-subtracts.  (Measured at
    257^3: the FMA reduction alone was a wash — the XLA while-loop's
    ~12 us/iteration overhead dominates the one-FMA body — so the scans
    are additionally 16-way unrolled, which cuts the iteration count and
    with it the loop-overhead floor.)"""
    import numpy as np

    d = jnp.moveaxis(d, axis, 0)
    n = d.shape[0]
    bshape = (n,) + (1,) * (d.ndim - 1)
    zeros = jnp.zeros(d.shape[1:], d.dtype)
    host = all(
        isinstance(r, np.ndarray) for r in (a_rows, b_rows, c_rows)
    )
    if host:
        a64 = np.asarray(a_rows, np.float64)
        b64 = np.asarray(b_rows, np.float64)
        c64 = np.asarray(c_rows, np.float64)
        cp = np.zeros(n)
        alpha = np.zeros(n)
        beta = np.zeros(n)
        cp_prev = 0.0
        for i in range(n):
            denom = b64[i] - a64[i] * cp_prev
            cp[i] = c64[i] / denom
            alpha[i] = -a64[i] / denom
            beta[i] = 1.0 / denom
            cp_prev = cp[i]
        npdt = np.dtype(d.dtype)
        # BLOCKED scans: a plain lax.scan stacks its per-step output
        # with a one-row dynamic-update-slice — at 3D plane sizes that
        # is a sub-tile write (sublane dim 1) whose read-modify-write
        # overhead dominated the one-FMA body (measured ~12 us/step at
        # 257^3, flat under scan unrolling).  Carrying B=8 rows per
        # scan step makes every stacked write a full tile-aligned
        # (8, ...) block; the 8 inner rows run as a static python loop.
        B = 8
        npad = -(-n // B) * B
        padn = npad - n
        if padn:
            # identity padding rows: dp = d (= 0), x passthrough
            alpha = np.concatenate([alpha, np.zeros(padn)])
            beta = np.concatenate([beta, np.ones(padn)])
            cp = np.concatenate([cp, np.zeros(padn)])
            d = jnp.concatenate(
                [d, jnp.zeros((padn,) + d.shape[1:], d.dtype)], axis=0
            )
        blk = (npad // B, B) + (1,) * (d.ndim - 1)
        al_b = jnp.asarray(alpha.astype(npdt).reshape(blk))
        be_b = jnp.asarray(beta.astype(npdt).reshape(blk))
        cp_b = jnp.asarray(cp.astype(npdt).reshape(blk))
        d_blk = d.reshape((npad // B, B) + d.shape[1:])

        def fwd_pre(carry, xs):
            al_i, be_i, d_i = xs
            outs = []
            dp = carry
            for k in range(B):
                dp = al_i[k] * dp + be_i[k] * d_i[k]
                outs.append(dp)
            return dp, jnp.stack(outs)

        _, dps = lax.scan(fwd_pre, zeros, (al_b, be_b, d_blk))

        def bwd_pre(carry, xs):
            cp_i, dp_i = xs
            outs = []
            x = carry
            for k in reversed(range(B)):
                x = dp_i[k] - cp_i[k] * x
                outs.append(x)
            return x, jnp.stack(outs[::-1])

        _, xs = lax.scan(bwd_pre, zeros, (cp_b, dps), reverse=True)
        out = xs.reshape((npad,) + d.shape[1:])[:n]
        return jnp.moveaxis(out, 0, axis)

    a_b = jnp.asarray(a_rows, d.dtype).reshape(bshape)
    b_b = jnp.asarray(b_rows, d.dtype).reshape(bshape)
    c_b = jnp.asarray(c_rows, d.dtype).reshape(bshape)

    def fwd(carry, xs):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = xs
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (d_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    (_, _), (cps, dps) = lax.scan(fwd, (zeros, zeros), (a_b, b_b, c_b, d))

    def bwd(carry, xs):
        cp, dp = xs
        x = dp - cp * carry
        return x, x

    _, xs = lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return jnp.moveaxis(xs, 0, axis)


def relax_zebra_line(
    line_system_fn,
    v: Array,
    f: Array,
    m_int: Array,
    line_axis: int,
    zebra_axis: int,
    zebra_masks: tuple[Array, Array],
    nsweeps: int,
) -> Array:
    """Zebra line relaxation: solve whole grid lines along `line_axis`
    exactly (batched Thomas), alternating the two colors of lines by parity
    along `zebra_axis` — the line analogue of red-black ordering, for
    grids with strong coupling in one direction (anisotropy).

    `line_system_fn(v, f) -> (a_rows, b_rows, c_rows, d)` builds the
    tridiagonal system with all off-line neighbor terms moved to the RHS.
    Extension beyond the reference (BASELINE.json config 5)."""

    def half(v, m_zebra):
        a_r, b_r, c_r, d = line_system_fn(v, f)
        sol = thomas_tridiagonal(a_r, b_r, c_r, d, line_axis)
        return v + (m_zebra * m_int) * (sol - v)

    def one(_, v):
        v = half(v, zebra_masks[0])
        v = half(v, zebra_masks[1])
        return v

    if nsweeps == 1:
        return one(0, v)
    return lax.fori_loop(0, nsweeps, one, v)


def residual(
    apply_op: Callable[[Array], Array], v: Array, f: Array, m_int: Array
) -> Array:
    """r = f - L v on the interior, 0 on the boundary (reference
    CalculateResidual, e.g. MultiGrid2D.cpp:367-408)."""
    return m_int * (f - apply_op(v))


def _shift(a: Array, axis: int, offset: int) -> Array:
    """result[i] = a[i + offset]; wraparound only pollutes boundary points,
    which all consumers overwrite or mask."""
    return jnp.roll(a, -offset, axis=axis)


def _fit(a: Array, shape: tuple[int, ...]) -> Array:
    """Slice/zero-pad `a` to `shape` (reconcile physical padded shapes
    across levels; only padding regions are affected)."""
    if tuple(a.shape) == tuple(shape):
        return a
    a = a[tuple(slice(0, min(s, t)) for s, t in zip(a.shape, shape))]
    pads = [(0, t - s) for s, t in zip(a.shape, shape)]
    if any(p != (0, 0) for p in pads):
        a = jnp.pad(a, pads)
    return a


def restrict_full_weighting(
    fine: Array, m_int_coarse: Array, m_log_coarse: Array | None = None
) -> Array:
    """Full-weighting restriction (fine -> coarse), any dimension.

    Separable smoothing with [1/4, 1/2, 1/4] per axis, then stride-2
    subsampling; coarse boundary points are straight injection of the
    coincident fine point (reference "COPIO VALORI SUI BORDI",
    MultiGrid1D.cpp:44-49).  Output is fitted to the coarse physical shape
    with zeroed padding.
    """
    a = fine
    for ax in range(fine.ndim):
        a = 0.25 * _shift(a, ax, -1) + 0.5 * a + 0.25 * _shift(a, ax, +1)
    cshape = m_int_coarse.shape
    smoothed = _fit(_subsample2(a), cshape)
    injected = _fit(_subsample2(fine), cshape)
    out = injected + m_int_coarse * (smoothed - injected)
    if m_log_coarse is not None:
        out = out * m_log_coarse
    return out


def _subsample2(a: Array) -> Array:
    """Even-index stride-2 subsample on every axis via reshape + static
    slice.  A direct a[::2, ...] multi-axis strided slice lowers to a
    GATHER on TPU — measured 32 ms (vs a ~1 ms roofline) for one 2049^2
    restriction, which made restriction ~80% of the whole 2D FMG step.
    Splitting each axis as (n/2, 2) and picking index 0 is layout-free."""
    for ax in range(a.ndim):
        n = a.shape[ax]
        pre, post = a.shape[:ax], a.shape[ax + 1 :]
        if n % 2 == 0:
            a2 = a.reshape(pre + (n // 2, 2) + post)
            a = jax.lax.slice_in_dim(a2, 0, 1, axis=ax + 1).reshape(
                pre + (n // 2,) + post
            )
        else:
            body = jax.lax.slice_in_dim(a, 0, n - 1, axis=ax)
            a2 = body.reshape(pre + ((n - 1) // 2, 2) + post)
            body = jax.lax.slice_in_dim(a2, 0, 1, axis=ax + 1).reshape(
                pre + ((n - 1) // 2,) + post
            )
            last = jax.lax.slice_in_dim(a, n - 1, n, axis=ax)
            a = jnp.concatenate([body, last], axis=ax)
    return a


def _upsample_axis(a: Array, axis: int) -> Array:
    """Linear upsample m -> 2m-1 along `axis`:
    out[2i] = a[i], out[2i+1] = (a[i] + a[i+1]) / 2."""
    a = jnp.moveaxis(a, axis, 0)
    mid = 0.5 * (a[:-1] + a[1:])
    body = jnp.stack([a[:-1], mid], axis=1).reshape((-1,) + a.shape[1:])
    out = jnp.concatenate([body, a[-1:]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def _upsample_axis_periodic(a: Array, axis: int) -> Array:
    """Linear upsample m -> 2m along `axis` under wrap storage:
    out[2i] = a[i], out[2i+1] = (a[i] + a[(i+1) mod m]) / 2.  The wrapped
    midpoint pairs the last stored interior plane with stored plane 0 —
    the zero boundary — which is exactly the linear-interpolation value at
    the last fine interior point."""
    a = jnp.moveaxis(a, axis, 0)
    mid = 0.5 * (a + jnp.roll(a, -1, axis=0))
    out = jnp.stack([a, mid], axis=1).reshape((-1,) + a.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def prolong_linear(
    coarse: Array,
    fine_shape: tuple[int, ...] | None = None,
    periodic: bool = False,
) -> Array:
    """(Bi/tri)linear prolongation coarse -> fine, any dimension; returns the
    full fine-size array (callers apply it interior-only, reference
    Interpolate never writes the boundary).  When `fine_shape` is given the
    result is fitted to that physical shape.  `periodic` selects the wrap-
    storage upsample (m -> 2m, zero boundary plane shared)."""
    a = coarse
    up = _upsample_axis_periodic if periodic else _upsample_axis
    for ax in range(coarse.ndim):
        a = up(a, ax)
    if fine_shape is not None:
        a = _fit(a, fine_shape)
    return a


def inject(fine: Array, coarse_shape: tuple[int, ...]) -> Array:
    """Straight injection fine -> coarse: coarse[j] = fine[2j] (the
    reference's boundary-row transfer, used by FAS for restricting the
    current solution approximation)."""
    return _fit(_subsample2(fine), coarse_shape)


def apply_correction(v: Array, error: Array, m_int: Array) -> Array:
    """v <- v + e on the interior only (reference ApplyCorrection,
    MultiGrid1D.cpp:177-188)."""
    return v + m_int * error


def set_interior(v: Array, value: float, m_int: Array) -> Array:
    """Fill the interior with `value`, keep the boundary (reference
    setToValue with modifyBoundaries=false, MultiGrid1D.cpp:120-130)."""
    return v + m_int * (value - v)

"""Fast-diagonalization coarse solver (TPU-native exact coarse grids).

The reference "solves" its coarsest grid with nu1+nu2 relaxation sweeps
(MultiGrid1D.cpp:150-175 recursion base case), and every intermediate
coarse level costs nu sweeps per leg.  On TPU the tiny levels' sweeps
are latency-bound — dozens of VPU ops each touching one or two tiles —
and measured to dominate the FMG step's nu-slope (~40-55 us/nu-unit of
launch-bound sweep work below 64^3 at 129^3).

For separable constant-coefficient operators (the Poisson family), the
Dirichlet problem diagonalizes in the per-axis discrete sine basis:

    A = sum_ax (1/h_ax^2) I x..x D2 x..x I,
    D2 = tridiag(1, -2, 1),   Q^T D2 Q = diag(lam),
    Q[j,k] = sqrt(2/n) sin((j+1)(k+1) pi / n),
    lam_k  = -4 sin^2((k+1) pi / (2n)),

so an EXACT interior solve is six small axis contractions plus one
elementwise scale — MXU work, independent of nu.  Configured as the
cycle's coarsest-level solver (CycleConfig(coarsest="exact")) it
replaces the entire deeper hierarchy: a 3-level 129^3 cycle (128, 64,
32 stored) has strictly better coarse-grid correction than the
reference's recursion-to-3^3 (two-grid theory) at a fraction of the
time.

Wrap storage only (homogeneous Dirichlet: stored index 0 is the zero
boundary plane, interior rows 1..S-1 for stored size S = 2^k).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.grid import LevelGeometry


def dirichlet_sine_basis(n_int: int, h: float):
    """(Q, lam) for the 1D Dirichlet Laplacian on n_int interior points
    with spacing h: Q orthonormal (columns = eigenvectors), lam the
    eigenvalues of (1/h^2) tridiag(1, -2, 1) — float64 assembly for
    accuracy, cast by the caller."""
    n = n_int + 1  # number of intervals
    j = np.arange(1, n_int + 1, dtype=np.float64)
    Q = np.sqrt(2.0 / n) * np.sin(
        np.pi * np.outer(j, j) / n
    )
    lam = -4.0 / (h * h) * np.sin(np.pi * j / (2.0 * n)) ** 2
    return Q, lam


def padded_axis_mats(geom: LevelGeometry, dtype=jnp.float32):
    """Per-axis (Q_pad, lam_pad) embedded into the wrap-storage size:
    row/col 0 (the zero boundary plane) padded with zeros, lam padded
    with 0 at index 0.  Q_pad[s, k] maps spectral k -> stored s."""
    assert geom.wrap, "fast-diagonalization solve assumes wrap storage"
    mats = []
    for ax in range(geom.ndim):
        S = geom.padded_shape[ax]
        n_int = geom.shape[ax] - 2
        Q, lam = dirichlet_sine_basis(n_int, geom.spacing[ax])
        Qp = np.zeros((S, S), np.float64)
        Qp[1 : n_int + 1, 1 : n_int + 1] = Q
        lp = np.zeros((S,), np.float64)
        lp[1 : n_int + 1] = lam
        # NOTE: numpy (not jnp) outputs — they embed as program literals
        # instead of lifted closure inputs, which break AOT
        # lowered+compiled calls (same convention as cycles._zebra_masks)
        npdt = np.dtype(dtype)
        mats.append((Qp.astype(npdt), lp.astype(npdt)))
    return mats


# dense-inverse coarse solve: largest interior system worth a
# precomputed direct inverse (the (n, n) f32 literal and the O(n^2)
# matvec per visit stay trivially cheap at this size)
DENSE_COARSE_MAX = 2048


def make_dense_coarse_solve(problem, geom: LevelGeometry):
    """solve(v, f, aux) -> v for ANY linear problem at a small coarsest
    level: the interior operator matrix is assembled once by probing
    `apply_operator` with unit vectors (on the CPU backend, at build
    time), inverted with numpy, and applied as one small matvec.

    Boundary handling is storage-agnostic: the Dirichlet data in `v`
    enters through r = f - A(v_boundary-only), so nonzero-boundary
    padded levels (e.g. the Lyapunov family) solve exactly too.

    Returns None for nonlinear problems or interiors above
    DENSE_COARSE_MAX points."""
    if getattr(problem, "nonlinear", False):
        return None
    nd = geom.ndim
    n_ax = [max(geom.shape[d] - 2, 1) for d in range(nd)]
    n_int = int(np.prod(n_ax))
    if not 1 <= n_int <= DENSE_COARSE_MAX:
        return None
    lo = tuple(slice(1, geom.shape[d] - 1) for d in range(nd))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        aux0 = problem.init_level(geom, dtype=jnp.float32).aux

        def apply_int(e_flat):
            e = jnp.zeros(geom.padded_shape, jnp.float32)
            e = e.at[lo].set(e_flat.reshape(n_ax))
            out = problem.apply_operator(e, geom, aux0)
            return out[lo].reshape(-1)

        rows = jax.jit(jax.vmap(apply_int))(
            jnp.eye(n_int, dtype=jnp.float32)
        )
    A = np.asarray(rows, np.float64).T  # row j of `rows` = A e_j
    Ainv = np.linalg.inv(A).astype(np.float32)  # numpy: embeds as literal

    def solve(v, f, aux):
        m_int, m_log = aux["m_int"], aux["m_log"]
        v0 = v * (m_log - m_int)  # Dirichlet data only
        r = m_int * (f - problem.apply_operator(v0, geom, aux))
        vi = jnp.matmul(
            Ainv.astype(np.dtype(v.dtype)),
            r[lo].reshape(-1),
            precision=jax.lax.Precision.HIGHEST,
        )
        return v0.at[lo].set(vi.reshape(n_ax).astype(v.dtype))

    return solve


def make_coarse_solve(problem, geom: LevelGeometry):
    """Unified coarsest-level exact solver: fast diagonalization where
    the operator is separable (wrap Poisson family), dense probed
    inverse otherwise; fn(v, f, aux) -> v, or None."""
    fd = make_fastdiag_solve(problem, geom)
    if fd is not None:
        return lambda v, f, aux: fd(f)
    return make_dense_coarse_solve(problem, geom)


def make_fastdiag_solve(problem, geom: LevelGeometry, dtype=jnp.float32):
    """solve(f) -> v with A v = f exactly on the interior (v = 0 on the
    boundary planes), for problems whose operator is the separable
    anisotropic Laplacian (problem.separable_fastdiag(geom) truthy).
    Returns None when unsupported."""
    if not (
        geom.wrap
        and getattr(problem, "separable_fastdiag", lambda g: False)(geom)
    ):
        return None
    mats = padded_axis_mats(geom, np.float64)
    nd = geom.ndim
    # lam_sum[idx] = sum_ax lam_ax[idx_ax]; boundary entries (lam = 0 on
    # every axis' index 0) guarded to 1 — their spectral coefficients
    # are exactly 0 through the zero-padded Q rows
    lam_sum = 0.0
    for ax, (_, lp) in enumerate(mats):
        shape = [1] * nd
        shape[ax] = lp.shape[0]
        lam_sum = lam_sum + lp.reshape(shape)
    npdt = np.dtype(dtype)
    inv = (1.0 / np.where(lam_sum == 0, 1.0, lam_sum)).astype(npdt)
    mats = [(Q.astype(npdt), lp.astype(npdt)) for Q, lp in mats]

    letters = "xyz"[:nd]
    spec_ab = "ab"

    def axis_dot(a, mat, ax, transpose):
        src = letters[ax]
        m_spec = (
            f"{spec_ab[0]}{src}" if transpose else f"{src}{spec_ab[0]}"
        )
        out_letters = letters.replace(src, spec_ab[0])
        spec = f"{m_spec},{letters}->{out_letters}"
        # HIGHEST: XLA's default TPU matmul precision is bf16, whose
        # rounding gets amplified by the operator's condition number
        # (kappa ~ 4/(pi h)^2) through the spectral transforms — measured
        # as a stalled two-level cycle at 129^3/65^3
        out = jnp.einsum(
            spec,
            mat,
            a,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(a.dtype)
        # einsum output axes keep positional order of `out_letters`
        # which equals positions of `letters` — no transpose happened
        return out

    def solve(f):
        g = f
        for ax, (Qp, _) in enumerate(mats):
            g = axis_dot(g, Qp, ax, transpose=True)  # Q^T along ax
        g = g * inv
        for ax, (Qp, _) in enumerate(mats):
            g = axis_dot(g, Qp, ax, transpose=False)  # Q along ax
        return g

    return solve

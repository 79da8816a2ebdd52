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

import math

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
        out = jnp.einsum(
            spec,
            mat,
            a,
            preferred_element_type=jnp.float32,
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

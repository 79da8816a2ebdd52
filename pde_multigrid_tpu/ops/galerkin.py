"""Implicit-stencil sparse-operator layer + Galerkin (RAP) coarsening.

The BASELINE north-star requires an "implicit-stencil sparse-operator
layer (equivalent CSR/BSR assembly for coarse-grid and Galerkin
operators)".  TPU-first representation: an operator is a *dense stencil
coefficient field* — `coeffs[..., k]` holds the weight of neighbor offset
`offsets[k]` at every grid point (broadcastable for constant-coefficient
operators).  Applying it is K shifted fused-multiply-adds on the VPU; no
gathers, no indirection — this IS the TPU equivalent of a DIA/CSR matrix,
and `to_csr()` / `to_bcoo()` assemble the standard sparse formats from it
for interop and verification.

Galerkin coarsening computes A_c = R A_f P numerically (full-weighting R,
(multi)linear P — the same transfer ops the cycles use): probing with 3^d
period-3 comb functions decouples the stencil entries, because the coarse
operator reach is 1 in every axis.  For the 1D Laplacian this reproduces
the rediscretized coarse operator exactly (classic result, verified in
tests); for d>1 it yields the 9/27-point Galerkin operator.

Red-black sweeps on Galerkin stencils touch same-color diagonal neighbors,
making the two half-sweeps hybrid Jacobi/GS — standard multicolor
smoothing, still an excellent smoother (tests assert textbook rho).
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.ops import stencil as stencil_ops

Array = jax.Array


def _shift_multi(a: Array, offset: Sequence[int]) -> Array:
    """result[x] = a[x + offset] (wraparound hits only masked regions)."""
    for ax, off in enumerate(offset):
        if off:
            a = jnp.roll(a, -off, axis=ax)
    return a


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["coeffs"],
    meta_fields=["offsets"],
)
@dataclasses.dataclass
class StencilOperator:
    """A sparse operator in implicit-stencil form.

    offsets: static tuple of d-tuples (the sparsity pattern, reach <= 1).
    coeffs:  array broadcastable to (*grid_shape, len(offsets)); entry
             [..., k] is the matrix entry A[x, x+offsets[k]].
    """

    offsets: tuple[tuple[int, ...], ...]
    coeffs: Array

    @property
    def center_index(self) -> int:
        return self.offsets.index((0,) * len(self.offsets[0]))

    def apply(self, v: Array) -> Array:
        out = None
        for k, off in enumerate(self.offsets):
            term = self.coeffs[..., k] * _shift_multi(v, off)
            out = term if out is None else out + term
        return out

    def gs_update(self, v: Array, f: Array) -> Array:
        """Pointwise local solve: (f - sum_offdiag c_k v[x+k]) / c_center."""
        c = self.center_index
        acc = f
        for k, off in enumerate(self.offsets):
            if k == c:
                continue
            acc = acc - self.coeffs[..., k] * _shift_multi(v, off)
        return acc / self.coeffs[..., c]

    # -- sparse-format assembly (interop / verification) -------------------

    def to_csr(self, shape: tuple[int, ...], m_int: np.ndarray):
        """Assemble CSR (indptr, indices, data) over all grid points in
        C order.  Interior rows carry the stencil (columns outside the
        array are dropped — consistent with masked application to fields
        that vanish on the boundary ring); non-interior rows are identity.
        """
        coeffs = np.broadcast_to(
            np.asarray(self.coeffs), tuple(shape) + (len(self.offsets),)
        )
        m_int = np.asarray(m_int, bool)
        strides = np.cumprod((shape + (1,))[::-1])[::-1][1:]

        indptr = [0]
        indices: list[int] = []
        data: list[float] = []
        for idx in itertools.product(*[range(s) for s in shape]):
            flat = int(sum(i * s for i, s in zip(idx, strides)))
            if not m_int[idx]:
                indices.append(flat)
                data.append(1.0)
            else:
                row = []
                for k, off in enumerate(self.offsets):
                    nb = tuple(i + o for i, o in zip(idx, off))
                    if all(0 <= i < s for i, s in zip(nb, shape)):
                        nb_flat = int(
                            sum(i * s for i, s in zip(nb, strides))
                        )
                        row.append((nb_flat, float(coeffs[idx + (k,)])))
                row.sort()
                for col, val in row:
                    indices.append(col)
                    data.append(val)
            indptr.append(len(indices))
        return (
            np.asarray(indptr, np.int64),
            np.asarray(indices, np.int64),
            np.asarray(data, np.float64),
        )

    def to_bcoo(self, shape: tuple[int, ...], m_int: np.ndarray):
        """jax.experimental.sparse BCOO assembly of the same matrix."""
        from jax.experimental import sparse as jsparse

        indptr, indices, data = self.to_csr(shape, m_int)
        n = int(np.prod(shape))
        rows = np.repeat(np.arange(n), np.diff(indptr))
        idx = np.stack([rows, indices], axis=1)
        return jsparse.BCOO(
            (jnp.asarray(data, jnp.float32), jnp.asarray(idx)),
            shape=(n, n),
        )


def neighborhood_offsets(ndim: int) -> tuple[tuple[int, ...], ...]:
    """The full (-1, 0, 1)^d neighborhood, center included."""
    return tuple(itertools.product((-1, 0, 1), repeat=ndim))


def rap_coarsen(
    op_fine: StencilOperator,
    fine_geom: LevelGeometry,
    coarse_geom: LevelGeometry,
    fine_aux: dict,
    coarse_aux: dict,
) -> StencilOperator:
    """Galerkin coarse operator A_c = R A_f P as a full 3^d stencil.

    R/P are exactly the cycle transfer ops (full-weighting restriction with
    zero-boundary residual semantics, (multi)linear interior prolongation).
    Probing: apply R A P to the 3^d coarse comb functions chi_p(x) =
    [x mod 3 == p]; since the coarse reach is 1, entries decouple:
    A_c[x, o] = (R A P chi_{(x+o) mod 3})(x).
    """
    ndim = coarse_geom.ndim
    cshape = coarse_geom.padded_shape
    m_int_f = fine_aux["m_int"]
    m_int_c = coarse_aux["m_int"]
    m_log_c = coarse_aux["m_log"]
    dtype = m_int_c.dtype

    def rap(chi: Array) -> Array:
        # P: prolong as an *error* field (zero boundary, interior only);
        # under wrap storage use the periodic upsample — the same P the
        # cycle applies (GalerkinKernels.prolong), so the probed A_c is
        # exactly the cycle's R A P
        e_f = stencil_ops.prolong_linear(
            chi, fine_geom.padded_shape, periodic=fine_geom.wrap
        )
        e_f = e_f * m_int_f
        # A on the fine interior
        a_e = op_fine.apply(e_f) * m_int_f
        # R with boundary injection of the (zero) boundary values
        return stencil_ops.restrict_full_weighting(a_e, m_int_c, m_log_c)

    # index grids for comb construction / coefficient scatter
    idx = [
        jax.lax.broadcasted_iota(jnp.int32, cshape, d) % 3
        for d in range(ndim)
    ]

    ys = {}
    for p in itertools.product(range(3), repeat=ndim):
        chi = None
        for d in range(ndim):
            m = (idx[d] == p[d])
            chi = m if chi is None else chi & m
        ys[p] = rap(chi.astype(dtype))

    offsets = neighborhood_offsets(ndim)
    coeff_list = []
    for off in offsets:
        acc = None
        for p in itertools.product(range(3), repeat=ndim):
            sel = None
            for d in range(ndim):
                m = ((idx[d] + off[d]) % 3) == p[d]
                sel = m if sel is None else sel & m
            term = jnp.where(sel, ys[p], 0.0)
            acc = term if acc is None else acc + term
        coeff_list.append(acc)
    coeffs = jnp.stack(coeff_list, axis=-1)
    # rows are only ever used on the coarse interior; make off-interior
    # rows identity so gs_update's divide is safe everywhere
    ci = offsets.index((0,) * ndim)
    eye = jnp.zeros_like(coeffs).at[..., ci].set(1.0)
    m = m_int_c[..., None]
    coeffs = coeffs * m + eye * (1.0 - m)
    return StencilOperator(offsets=offsets, coeffs=coeffs)


def galerkin_hierarchy(
    op_finest: StencilOperator,
    geoms: Sequence[LevelGeometry],
    auxes: Sequence[dict],
) -> list[StencilOperator]:
    """Finest-to-coarsest operator chain by repeated RAP."""
    ops = [op_finest]
    for l in range(len(geoms) - 1):
        ops.append(
            rap_coarsen(
                ops[-1], geoms[l], geoms[l + 1], auxes[l], auxes[l + 1]
            )
        )
    return ops


class GalerkinKernels:
    """Kernel tier where every level's operator is an implicit-stencil
    field read from Level.aux['stencil_coeffs'] (as a jit argument, so
    hierarchies stay donatable).  Offsets are static per level."""

    def __init__(
        self,
        problem,
        geoms: Sequence[LevelGeometry],
        offsets_per_level: Sequence[tuple[tuple[int, ...], ...]],
        smoother: str = "rbgs",
        omega: float = 1.0,
        pallas: str = "off",
    ):
        self.problem = problem
        self.geoms = tuple(geoms)
        self.offsets = list(offsets_per_level)
        self.smoother = smoother
        self.omega = omega
        # pallas: "off" | "tpu" | "interpret" — stencil-operator relax
        # kernels (ops/pallas/stencilop.py): VMEM-resident where the
        # level fits, streaming 2D slab beyond that (VERDICT r3 #3);
        # the jnp tier serves the rest (and non-rbgs smoothers)
        self._relax_fns = [None] * len(self.geoms)
        if pallas != "off" and smoother == "rbgs":
            from pde_multigrid_tpu.ops.pallas import stencilop

            self._relax_fns = [
                stencilop.plan_stencil_relax(
                    offs, g, jnp.float32, interpret=(pallas == "interpret")
                )
                for offs, g in zip(self.offsets, self.geoms)
            ]
        # big non-wrap 2D pairs: XLA MXU pick-matrix transfers (the jnp
        # tier's lane-dim relayouts dominate the 2D fixed cost at bench
        # sizes — VERDICT r4 #2); engaged alongside the kernel tier
        self._xla_restrict = [None] * len(self.geoms)
        self._xla_prolong = [None] * len(self.geoms)
        if pallas != "off":
            from pde_multigrid_tpu.ops.pallas import transfer as T

            for l in range(len(self.geoms) - 1):
                gf, gc = self.geoms[l], self.geoms[l + 1]
                if T.xla_pair_ok_2d(gf, gc):
                    self._xla_restrict[l] = T.make_xla_restrict_2d(
                        gf, gc, jnp.float32,
                        edge_injection=not hasattr(
                            problem, "kernel_keep_mask"
                        ),
                    )
                    self._xla_prolong[l] = T.make_xla_prolong_2d(
                        gc, gf, jnp.float32
                    )

    def _op(self, l: int, aux) -> StencilOperator:
        return StencilOperator(
            offsets=self.offsets[l], coeffs=aux["stencil_coeffs"]
        )

    def relax(self, l, v, f, aux, nsweeps, f_zero=False):
        fn = self._relax_fns[l]
        if fn is not None:
            return fn(
                v,
                f,
                aux["stencil_coeffs"],
                aux["m_red"],
                aux["m_black"],
                nsweeps,
            )
        op = self._op(l, aux)
        if self.smoother == "jacobi":
            return stencil_ops.relax_jacobi(
                lambda vv, ff: op.gs_update(vv, ff),
                v,
                f,
                aux["m_int"],
                self.omega,
                nsweeps,
            )
        return stencil_ops.relax_rbgs(
            lambda vv, ff: op.gs_update(vv, ff),
            v,
            f,
            aux["m_red"],
            aux["m_black"],
            nsweeps,
        )

    def residual(self, l, v, f, aux):
        op = self._op(l, aux)
        return stencil_ops.residual(op.apply, v, f, aux["m_int"])

    def restrict(self, l_fine, arr, m_int_coarse, m_log_coarse):
        fn = self._xla_restrict[l_fine]
        if fn is not None:
            return fn(arr, m_int_coarse, m_log_coarse)
        return stencil_ops.restrict_full_weighting(
            arr, m_int_coarse, m_log_coarse
        )

    def prolong(self, l_fine, arr):
        fn = self._xla_prolong[l_fine]
        if fn is not None:
            return fn(arr)
        g = self.geoms[l_fine]
        return stencil_ops.prolong_linear(
            arr, g.padded_shape, periodic=g.wrap
        )

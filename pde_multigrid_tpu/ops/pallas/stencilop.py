"""Pallas relaxation for implicit-stencil (variable-coefficient) operators.

Serves the Galerkin tier (`ops/galerkin.py::GalerkinKernels`) — the
coarse-operator layer the reference lacks entirely (it rediscretizes,
SURVEY.md §2.4) — and through it `models/varcoef.py`.  The jnp tier pays
~2*(K+2) full HBM array round trips per RBGS sweep (v, f, and the K
stencil-coefficient fields are re-read for BOTH color passes); this
kernel keeps everything resident in VMEM for all `nsweeps` sweeps, so a
relax leg costs ONE round trip of K+4 arrays regardless of nu.

The in-kernel arithmetic mirrors `StencilOperator.gs_update` +
`stencil.relax_rbgs` term-for-term (same offset order, same subtract
chain, same divide by the center coefficient, same masked blend);
results match the jnp tier to 1 ulp (XLA's FMA contraction differs
between the pallas interpreter and the eager path) — pinned by
tests/test_stencilop.py.

Coefficient layout: the (*grid, K) aux field is unstacked OUTSIDE the
kernel into K dense operands (kernels cannot capture array constants;
the unstack is a per-leg fixed cost amortized over the nu sweeps, like
the 2D color-split conversions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.ops.pallas.relax import (
    RESIDENT_VMEM_BUDGET,
    tile_padded_bytes,
)


def make_stencil_relax_resident(
    offsets: tuple[tuple[int, ...], ...],
    geom: LevelGeometry,
    dtype,
    interpret: bool = False,
):
    """relax(v, f, coeffs, m_red, m_black, nsweeps) resident in VMEM.

    `offsets` is the level's static sparsity pattern (reach <= 1);
    `coeffs` the (*padded_shape, K) coefficient field.  Returns None
    when the level does not fit the resident budget or is misaligned.
    """
    shape = tuple(geom.padded_shape)
    K = len(offsets)
    ndim = len(shape)
    assert all(len(o) == ndim for o in offsets)
    ci = offsets.index((0,) * ndim)
    # 1D levels run lifted to (1, N); lift the offsets with them
    if ndim == 1:
        kshape = (1,) + shape
        koffsets = tuple((0,) + o for o in offsets)
    else:
        kshape = shape
        koffsets = offsets
    # no alignment gate: whole-array VMEM operands are tiled (and lane/
    # sublane-padded) by Mosaic itself — only the budget matters, and
    # tile_padded_bytes accounts for the physical padding
    # residency: v, f, K coeff fields, 2 masks, out + ~3 roll/acc temps
    if tile_padded_bytes(kshape) * (K + 8) > RESIDENT_VMEM_BUDGET:
        return None

    def kernel(*refs, nsweeps):
        v_ref, f_ref = refs[0], refs[1]
        c_refs = refs[2 : 2 + K]
        mr_ref, mb_ref, o_ref = refs[2 + K], refs[3 + K], refs[4 + K]
        f = f_ref[:]
        cs = [c[:] for c in c_refs]
        m_red, m_black = mr_ref[:], mb_ref[:]

        def gs(v):
            # term-for-term StencilOperator.gs_update (offset order,
            # subtract chain, center divide)
            acc = f
            for k, off in enumerate(koffsets):
                if k == ci:
                    continue
                a = v
                for ax, o in enumerate(off):
                    if o:
                        a = jnp.roll(a, -o, axis=ax)
                acc = acc - cs[k] * a
            return acc / cs[ci]

        def one(_, v):
            v = v + m_red * (gs(v) - v)
            v = v + m_black * (gs(v) - v)
            return v

        v = v_ref[:]
        o_ref[:] = (
            one(0, v) if nsweeps == 1 else lax.fori_loop(0, nsweeps, one, v)
        )

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps),
            out_shape=jax.ShapeDtypeStruct(kshape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (K + 4),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def relax(v, f, coeffs, m_red, m_black, nsweeps: int):
        call = build(nsweeps)
        cs = tuple(coeffs[..., k] for k in range(K))
        args = (v, f, *cs, m_red, m_black)
        if ndim == 1:
            return call(*(a[None, :] for a in args))[0]
        return call(*args)

    return relax

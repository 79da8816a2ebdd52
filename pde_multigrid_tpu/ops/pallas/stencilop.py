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
        # constant-coefficient operators (e.g. Poisson.stencil_operator)
        # carry (1,)*ndim+(K,) coeffs: materialize to full shape before
        # the pallas_call rather than relying on in-kernel broadcast
        # against full-shape arrays under Mosaic (ADVICE r3); the VMEM
        # budget already charges full-shape footprints
        cs = tuple(
            jnp.broadcast_to(coeffs[..., k], v.shape) for k in range(K)
        )
        args = (v, f, *cs, m_red, m_black)
        if ndim == 1:
            return call(*(a[None, :] for a in args))[0]
        return call(*args)

    return relax


def make_stencil_relax_slab_2d(
    offsets: tuple[tuple[int, ...], ...],
    geom: LevelGeometry,
    dtype,
    slab_rows: int,
    sweeps_per_call: int,
    interpret: bool = False,
):
    """Streaming slab relax for beyond-resident 2D stencil-operator
    levels (VERDICT r3 #3: SURVEY §7 L3 makes the assembled-operator
    layer first-class, but at any interesting size the jnp tier was the
    slow tier at ~2(K+2) full HBM array round trips per sweep).

    Same trapezoidal pipeline as relax.make_slab_relax, with the K
    coefficient fields streamed per block alongside v and f: axis-0
    slabs of B owned rows + round_up(2T, 8)-row halos per side (the
    9-point Galerkin stencil reads both x-sides), double-buffered DMA,
    T red-black sweeps per HBM round trip.  Checkerboard parity and
    interior masks are computed in-kernel from the block's global row
    (Galerkin levels are linear — no keep-mask hook), so only K+2
    streams flow.  HBM per T-sweep chunk: (K+2)*(ext/B) reads + 1
    write, e.g. K=9, B=64, T=8 at 1025^2: ~2.3 arrays/sweep vs the jnp
    tier's ~22.

    The per-point arithmetic is the same gs_update subtract chain and
    `v + m*(gs - v)` blend as the resident kernel/jnp tier; owned rows
    are exact by the standard trapezoid argument (corruption advances
    2 rows per red+black sweep, halo >= 2T).

    Wrap (2^k) storage: in-buffer axis-0 rolls wrap locally, so the
    +x neighbor of global row X-1 (the wrap-to-zero boundary read)
    needs 8 always-zero rows appended to the scratch buffers, exactly
    like relax.make_slab_relax; the center-coefficient buffer's zero
    rows are set to ONE so the gs divide stays finite there (those
    rows are masked and discarded, but 0*NaN would poison the blend).
    Lane (y) rolls wrap onto stored column 0, which IS the zero
    boundary in wrap storage — same as the jnp tier."""
    shape = tuple(geom.padded_shape)
    assert len(shape) == 2
    K = len(offsets)
    ci = offsets.index((0, 0))
    X, Y = shape
    B = slab_rows
    T = sweeps_per_call
    halo = -((2 * T) // -8) * 8
    assert B % 8 == 0 and X % 8 == 0 and Y % 128 == 0
    ext = B + 2 * halo
    ext += (X - ext) % 2  # even slab starts: block-invariant parity
    assert X >= ext, (X, ext)
    zrow = 8 if geom.wrap else 0
    loc = ext + zrow
    nblk = X // B
    rem_start = nblk * B
    assert rem_start >= geom.shape[0] - 1
    max_start = X - ext
    assert B % 2 == 0 and halo % 2 == 0 and (X - ext) % 2 == 0
    nx, ny = geom.shape

    def kernel(*refs, nsweeps_here):
        hbms = refs[: K + 2]  # v, f, c_0..c_{K-1}
        o_hbm = refs[K + 2]
        bufs = refs[K + 3 : 2 * K + 5]
        mred_ref, mblack_ref, in_sem, out_sem = refs[2 * K + 5 :]
        vbuf = bufs[0]

        def start_units(p):
            return jnp.clip(
                p * (B // 8) - halo // 8, 0, max_start // 8
            )

        def start_of(p):
            return start_units(p) * 8

        def in_dmas(slot, p):
            s = start_of(p)
            return [
                pltpu.make_async_copy(
                    h.at[pl.ds(s, ext)],
                    b.at[slot, pl.ds(0, ext)],
                    in_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(zip(hbms, bufs))
            ]

        def out_dma(slot, p):
            off = (p * (B // 8) - start_units(p)) * 8
            return pltpu.make_async_copy(
                vbuf.at[slot, pl.ds(off, B)],
                o_hbm.at[pl.ds(p * B, B)],
                out_sem.at[slot],
            )

        if zrow:
            # appended boundary rows, set once (never DMA'd over by the
            # block windows): the jnp tier's axis-0 rolls wrap onto
            # STORED row 0 — the (possibly nonzero) Dirichlet boundary
            # of e.g. manufactured-solution problems — so the v buffer
            # gets a copy of global rows [0, zrow) rather than zeros
            # (row 0 is masked and never updated, so the copy is
            # leg-invariant).  f/coeff rows are only read at the center
            # (no rolls) and their outputs are masked+discarded; center
            # coefficient = 1 keeps the gs divide finite there.
            zeros = jnp.zeros((zrow, Y), dtype)
            ones = jnp.ones((zrow, Y), dtype)
            for k, b in enumerate(bufs[1:], start=1):
                fill = ones if k == 2 + ci else zeros
                b[0, ext:] = fill
                b[1, ext:] = fill
            for slot in (0, 1):
                cp = pltpu.make_async_copy(
                    hbms[0].at[pl.ds(0, zrow)],
                    vbuf.at[slot, pl.ds(ext, zrow)],
                    in_sem.at[slot, 0],
                )
                cp.start()
                cp.wait()
        for d in in_dmas(0, 0):
            d.start()

        # hoisted parity + y-interiority (x-validity is per block)
        jj = lax.broadcasted_iota(jnp.int32, (loc, Y), 1)
        ii = lax.broadcasted_iota(jnp.int32, (loc, Y), 0)
        ok_y = (jj >= 1) & (jj <= ny - 2)
        par = (ii + jj) % 2
        mred_ref[:] = ((par == 0) & ok_y).astype(dtype)
        mblack_ref[:] = ((par == 1) & ok_y).astype(dtype)

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            @pl.when(p + 1 < nblk)
            def _():
                @pl.when(p >= 1)
                def _():
                    out_dma(nxt, p - 1).wait()

                for d in in_dmas(nxt, p + 1):
                    d.start()

            for d in in_dmas(slot, p):
                d.wait()
            s = start_of(p)
            g = s + lax.broadcasted_iota(jnp.int32, (loc, 1), 0)
            rv = ((g >= 1) & (g <= nx - 2)).astype(dtype)
            m_red = mred_ref[:] * rv
            m_black = mblack_ref[:] * rv
            f = bufs[1][slot]
            cs = [bufs[2 + k][slot] for k in range(K)]

            def gs(v):
                acc = f
                for k, off in enumerate(offsets):
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

            v = vbuf[slot]
            v_new = (
                one(0, v)
                if nsweeps_here == 1
                else lax.fori_loop(0, nsweeps_here, one, v)
            )
            # static slice keeps the trailing zero rows intact for this
            # slot's next turn (non-top slabs "update" them via rv)
            if zrow:
                vbuf[slot, :ext] = v_new[:ext]
            else:
                vbuf[slot] = v_new
            out_dma(slot, p).start()
            return 0

        lax.fori_loop(0, nblk, body, 0)
        out_dma((nblk - 1) % 2, nblk - 1).wait()
        if nblk > 1:
            out_dma((nblk - 2) % 2, nblk - 2).wait()

    @functools.lru_cache(maxsize=None)
    def build(nsweeps_here: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps_here=nsweeps_here),
            out_shape=jax.ShapeDtypeStruct((rem_start, Y), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (K + 2),
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, loc, Y), dtype) for _ in range(K + 2)
            ]
            + [
                pltpu.VMEM((loc, Y), dtype),
                pltpu.VMEM((loc, Y), dtype),
                pltpu.SemaphoreType.DMA((2, K + 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )

    def relax(v, f, coeffs, m_red, m_black, nsweeps: int):
        del m_red, m_black  # masks are rebuilt in-kernel
        # constant-coefficient (1,1,K) fields must be materialized: the
        # per-block stream DMAs slice axis 0 (ADVICE r3)
        cs = tuple(
            jnp.broadcast_to(coeffs[..., k], v.shape) for k in range(K)
        )
        n_full, rem = divmod(nsweeps, T)

        def run(v, t):
            out = build(t)(v, f, *cs)
            if rem_start == X:
                return out
            return jnp.concatenate([out, v[rem_start:]], axis=0)

        if n_full:
            if n_full == 1:
                v = run(v, T)
            else:
                v = lax.fori_loop(
                    0, n_full, lambda _, vv: run(vv, T), v
                )
        if rem:
            v = run(v, rem)
        return v

    return relax


def stencil_slab2d_params(shape, x_cover: int, k: int):
    """(B, T, ext) ladder for the streaming 2D stencil-operator slab —
    shared by plan_stencil_relax and the roofline traffic model
    (utils/roofline.py) so the model tracks the tier that runs.
    Returns None when no block fits (jnp tier serves the level)."""
    from pde_multigrid_tpu.ops.pallas.relax import (
        SLAB_VMEM_BUDGET,
        SPLIT2D_MAX_WINDOW,
    )

    X, Y = shape
    if X % 8 or Y % 128:
        return None
    for T in (8, 4):
        for B in (64, 32, 16, 8):
            halo = -((2 * T) // -8) * 8
            ext = B + 2 * halo
            ext += (X - ext) % 2
            if X < ext or (X // B) * B < x_cover:
                continue
            # VMEM: (K+2) double-buffered streams + 2 masks + ~4 temps
            unit = ext * Y * 4
            if (
                unit * (2 * (k + 2) + 6) <= SLAB_VMEM_BUDGET
                and unit <= SPLIT2D_MAX_WINDOW
            ):
                return B, T, ext
    return None


def plan_stencil_relax(
    offsets, geom: LevelGeometry, dtype, interpret: bool = False
):
    """Resident-else-slab tier selection for one stencil-operator level
    (mirrors relax.plan_relax's structure).  Returns None when neither
    engages (the jnp tier serves the level)."""
    fn = make_stencil_relax_resident(offsets, geom, dtype, interpret)
    if fn is not None:
        return fn
    shape = tuple(geom.padded_shape)
    if len(shape) != 2:
        return None
    plan = stencil_slab2d_params(
        shape, geom.shape[0] - 1, len(offsets)
    )
    if plan is None:
        return None
    return make_stencil_relax_slab_2d(
        offsets, geom, dtype, plan[0],
        sweeps_per_call=plan[1], interpret=interpret,
    )

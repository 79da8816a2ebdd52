"""Fused red-black Gauss-Seidel relaxation kernels (Pallas/Mosaic, TPU).

This is the native-kernel tier replacing the reference's CUDA relaxation
kernels (CUDARelax, e.g. MultiGrid3D.cu:609-675) — redesigned for TPU
rather than translated:

  * The reference launches one kernel per sweep and round-trips HBM(GDDR)
    twice per sweep; its in-kernel `__syncthreads()` between colors is a
    cross-block race (SURVEY.md §2.7.1).
  * Here, masks and coefficient fields are *recomputed in registers* from
    `broadcasted_iota` (zero HBM traffic), divisions are hoisted into
    per-invocation reciprocals, and sweeps are batched:

    - RESIDENT kernel: the whole level lives in VMEM; ALL nu sweeps run in
      one kernel invocation with a single HBM read and write.  This covers
      every coarse level and entire problems up to ~VMEM capacity.
    - SLAB kernel: levels too big for VMEM are processed in axis-0 slabs.
      Each grid step DMAs a slab plus a 2T-row halo from HBM, runs T full
      red-black sweeps locally (trapezoidal/overlapped tiling: stale-halo
      corruption advances at most 2 rows per sweep, so a 2T halo keeps the
      emitted B rows exact), and writes back the B owned rows.  HBM traffic
      per sweep drops from ~5 arrays (jnp tier) to ~(2 reads + 1 write)/T.

Correctness contract: bit-for-bit the same *algorithm* as ops.stencil
.relax_rbgs (two colored half-sweeps, reference ordering); float results
differ only by reciprocal-vs-divide rounding.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_multigrid_tpu.grid import LevelGeometry

Array = jax.Array


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def tile_padded_bytes(shape: Sequence[int], itemsize: int = 4) -> int:
    """Physical VMEM footprint of an array under Mosaic tiling of the last
    two dims: (8, 128) for f32, (16, 128) for bf16 — the sublane tile is
    32 bytes deep regardless of itemsize."""
    s = list(shape)
    if len(s) == 1:
        s = [1] + s
    s[-1] = _round_up(s[-1], 128)
    s[-2] = _round_up(s[-2], 32 // itemsize)
    out = itemsize
    for d in s:
        out *= d
    return out


def _local_coords(geom: LevelGeometry, shape, row0, dtype):
    """In-register physical coordinates for a local array of `shape`
    whose axis-0 rows start at global row `row0` (clipped to the
    domain so halo/padding rows stay finite)."""
    nd = len(shape)
    coords = []
    for d in range(nd):
        gidx = lax.broadcasted_iota(jnp.int32, shape, d)
        if d == 0:
            gidx = gidx + row0
        lo, hi = geom.domain[d]
        x = jnp.asarray(geom.origin[d], dtype) + gidx.astype(
            dtype
        ) * jnp.asarray(geom.spacing[d], dtype)
        coords.append(jnp.clip(x, min(lo, hi), max(lo, hi)))
    return tuple(coords)


def _coords_pre(problem, geom: LevelGeometry, shape, row0, dtype):
    """Problem coefficient precompute for a local array of `shape` whose
    axis-0 rows start at global row `row0`.  For constant-coefficient
    problems the (unused) coordinate arrays are dead-code-eliminated."""
    coords = _local_coords(geom, shape, row0, dtype)
    return problem.kernel_precompute(coords, geom, dtype)


def _coords_and_masks(problem, geom: LevelGeometry, shape, row0, dtype):
    """In-register coordinates, red/black interior masks for a local array
    of `shape` whose axis-0 rows start at global row `row0` (traced or 0).

    Returns (pre, m_red, m_black)."""
    nd = len(shape)
    iotas = [
        lax.broadcasted_iota(jnp.int32, shape, d) for d in range(nd)
    ]
    gidx = list(iotas)
    gidx[0] = gidx[0] + row0
    coords = []
    for d in range(nd):
        lo, hi = geom.domain[d]
        x = jnp.asarray(geom.origin[d], dtype) + gidx[d].astype(
            dtype
        ) * jnp.asarray(geom.spacing[d], dtype)
        coords.append(jnp.clip(x, min(lo, hi), max(lo, hi)))
    interior = None
    for d in range(nd):
        ok = (gidx[d] >= 1) & (gidx[d] <= geom.shape[d] - 2)
        interior = ok if interior is None else interior & ok
    par = sum(gidx) % 2
    m_red = ((par == 0) & interior).astype(dtype)
    m_black = ((par == 1) & interior).astype(dtype)
    # optional problem hook: extra never-update points beyond the
    # geometric boundary (e.g. HJB's pinned target ball, models/hjb.py
    # init_level) — must mirror the aux-mask adjustment exactly
    keep = getattr(problem, "kernel_keep_mask", None)
    if keep is not None:
        k = keep(tuple(coords), geom, dtype)
        m_red = m_red * k
        m_black = m_black * k
    pre = problem.kernel_precompute(tuple(coords), geom, dtype)
    return pre, m_red, m_black


def _sweeps(problem, geom, v, f, pre, m_red, m_black, nsweeps):
    def one(_, v):
        v = v + m_red * (problem.kernel_update(v, f, pre, geom) - v)
        v = v + m_black * (problem.kernel_update(v, f, pre, geom) - v)
        return v

    if nsweeps == 1:
        return one(0, v)
    return lax.fori_loop(0, nsweeps, one, v)


# ----------------------------------------------------------- resident kernel


def make_resident_relax(problem, geom: LevelGeometry, dtype, interpret=False):
    """relax(v, f, nsweeps) with the whole level resident in VMEM."""
    shape = geom.padded_shape
    kshape = shape if len(shape) > 1 else (1,) + tuple(shape)

    def kernel(*refs, nsweeps, with_f):
        if with_f:
            v_ref, f_ref, o_ref = refs
        else:
            # statically-zero RHS (f_zero leg): no f operand at all
            v_ref, o_ref = refs
            f_ref = None
        if len(shape) == 1:
            # 1D problems run as (1, N); global index is the lane index
            gx = lax.broadcasted_iota(jnp.int32, kshape, 1)
            lo, hi = geom.domain[0]
            x = jnp.asarray(geom.origin[0], dtype) + gx.astype(
                dtype
            ) * jnp.asarray(geom.spacing[0], dtype)
            x = jnp.clip(x, min(lo, hi), max(lo, hi))
            interior = (gx >= 1) & (gx <= geom.shape[0] - 2)
            par = gx % 2
            m_red = ((par == 0) & interior).astype(dtype)
            m_black = ((par == 1) & interior).astype(dtype)
            pre = problem.kernel_precompute((x,), geom, dtype)
        else:
            pre, m_red, m_black = _coords_and_masks(
                problem, geom, kshape, 0, dtype
            )
        o_ref[:] = _sweeps(
            problem,
            geom,
            v_ref[:],
            None if f_ref is None else f_ref[:],
            pre,
            m_red,
            m_black,
            nsweeps,
        )

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int, with_f: bool = True):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps, with_f=with_f),
            out_shape=jax.ShapeDtypeStruct(kshape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
                2 if with_f else 1
            ),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def relax(v, f, nsweeps: int, f_zero: bool = False):
        call = build(nsweeps, not f_zero)
        args = (v,) if f_zero else (v, f)
        if len(shape) == 1:
            return call(*(a[None, :] for a in args))[0]
        return call(*args)

    # dropping f calls kernel_update(v, None, ...): problem must opt in
    relax.supports_f_zero = bool(
        getattr(problem, "kernel_update_f_optional", False)
    )
    return relax


def make_split_resident_relax_1d(
    problem, geom: LevelGeometry, dtype, interpret=False,
    full_tiles=True,
):
    """1D color-split resident relaxation (padded storage).

    The dense 1D resident kernel computes every point's local solve in
    BOTH colored phases and discards half — and the reference's 1D
    update (Ode1D) reads only the east neighbor, so the waste dominates
    the tiny per-point arithmetic.  Red/black live as (1, N/2) lane
    halves (red = even global index): red's east neighbor is black at
    the SAME lane (no shift at all), black's east is red at lane+1 (one
    lane roll).  Coefficient fields are hoisted per color outside the
    sweep loop; all nu sweeps run in one invocation like the dense
    resident kernel.  Requires `problem.split_update1d(east, f, pre)`.

    Replaces the reference's per-sweep CUDARelax launches for the 1D
    family (CUDA 1D/MultiGrid1D.cu:249-272) at ~half the arithmetic.
    """
    assert geom.ndim == 1 and not geom.wrap
    (N,) = geom.padded_shape
    assert N % 2 == 0
    N2 = N // 2
    n = geom.shape[0]
    # 2D (R, C) layout for the halves (flat half index i = row*C + col):
    # a (1, N2) single-sublane value occupies one vreg per 128 lanes at
    # 1/8 occupancy — reshaping to full (8, 128) tiles cuts the VPU op
    # count ~8x.
    # The only layout cost is black's east neighbor (red at flat i+1):
    # a lane roll within the row plus, at the row's last lane, the next
    # row's column 0 — one (R, 1)-broadcast select per sweep.  Reads
    # that wrap past the final row land on zero padding or the stored
    # boundary, on points the masks exclude (same argument as the old
    # lane-wrap layout).  full_tiles=False keeps the single-row layout
    # (scripts/ab_split1d_layout.py interleaved A/B).
    C = min(N2, 128) if full_tiles else N2
    R = -(-N2 // C)
    N2p = R * C

    def kernel(r_ref, b_ref, fr_ref, fb_ref, ro_ref, bo_ref, *, nsweeps):
        ri = lax.broadcasted_iota(jnp.int32, (R, C), 0)
        ci = lax.broadcasted_iota(jnp.int32, (R, C), 1)
        ii = ri * C + ci
        lo, hi = geom.domain[0]
        h = jnp.asarray(geom.spacing[0], dtype)
        x0 = jnp.asarray(geom.origin[0], dtype)

        def coords(g):
            x = x0 + g.astype(dtype) * h
            return jnp.clip(x, min(lo, hi), max(lo, hi))

        g_r, g_b = 2 * ii, 2 * ii + 1
        pre_r = problem.kernel_precompute((coords(g_r),), geom, dtype)
        pre_b = problem.kernel_precompute((coords(g_b),), geom, dtype)
        m_r = ((g_r >= 1) & (g_r <= n - 2)).astype(dtype)
        m_b = (g_b <= n - 2).astype(dtype)  # odd index is always >= 1
        last = (ci == C - 1)
        fr, fb = fr_ref[:], fb_ref[:]

        def east_of(r):
            # red at flat i+1: lane roll, next-row col 0 at the seam
            rolled = jnp.roll(r, -1, 1)
            if R == 1:
                # the only seam is the final lane (point beyond the
                # boundary) — masked out, so the lane wrap is fine, and
                # an axis-0 roll would lower to a zero-size r[1:1]
                # slice Mosaic rejects.
                return rolled
            nxt0 = jnp.concatenate([r[1:, 0:1], r[:1, 0:1]], axis=0)
            return jnp.where(last, nxt0, rolled)

        def one_sweep(_, rb):
            r, b = rb
            upd = problem.split_update1d(b, fr, pre_r, geom)
            r = r + m_r * (upd - r)
            upd = problem.split_update1d(east_of(r), fb, pre_b, geom)
            b = b + m_b * (upd - b)
            return r, b

        r, b = lax.fori_loop(
            0, nsweeps, one_sweep, (r_ref[:], b_ref[:])
        )
        ro_ref[:] = r
        bo_ref[:] = b

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps),
            out_shape=(
                jax.ShapeDtypeStruct((R, C), dtype),
                jax.ShapeDtypeStruct((R, C), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )

    def _half(a):
        if N2p != N2:
            a = jnp.pad(a, (0, N2p - N2))
        return a.reshape(R, C)

    def relax(v, f, nsweeps: int, f_zero: bool = False):
        assert not f_zero
        v2 = v.reshape(N2, 2)
        f2 = f.reshape(N2, 2)
        r, b = build(nsweeps)(
            _half(v2[:, 0]), _half(v2[:, 1]),
            _half(f2[:, 0]), _half(f2[:, 1]),
        )
        r = r.reshape(N2p)[:N2]
        b = b.reshape(N2p)[:N2]
        return jnp.stack([r, b], axis=1).reshape(N)

    relax.supports_f_zero = False
    return relax


# --------------------------------------------------------------- slab kernel


def make_slab_relax(
    problem,
    geom: LevelGeometry,
    dtype,
    slab_rows: int,
    sweeps_per_call: int,
    interpret=False,
):
    """relax(v, f, nsweeps) processing axis-0 slabs with trapezoidal halos.

    One kernel invocation sweeps the whole level once (T sweeps): a
    fori_loop walks the nblk slabs; each slab owns `slab_rows` (B) output
    rows and locally runs `sweeps_per_call` (T) red-black sweeps on
    B + 4T rows streamed from HBM (2T halo per side; stale-halo corruption
    advances <= 2 rows/sweep so the B owned rows stay exact).

    HBM traffic is fully overlapped with compute by double buffering:
    while slab p relaxes in VMEM, the v/f slabs of p+1 stream into the
    other buffer slot and the finished rows of p-1 stream out — the
    classic prefetch pipeline the reference's one-kernel-launch-per-sweep
    structure (MultiGrid3D.cu:198-199) cannot express.

    nsweeps is decomposed into ceil(nsweeps/T) invocations chained by
    lax.fori_loop.
    """
    shape = geom.padded_shape
    nd = len(shape)
    assert nd >= 2, "slab kernel requires ndim >= 2"
    X = shape[0]
    B = slab_rows
    T = sweeps_per_call
    # For 2D arrays axis 0 is the SUBLANE dim (tiling (8, 128) covers the
    # last two dims), so every axis-0 DMA slice offset/size must be
    # 8-aligned — Mosaic rejects e.g. a 20-row memref_slice.  In 3D axis 0
    # is untiled and any extent works.  Round the DMA halo up to the
    # alignment; the extra context rows are harmless (they widen the
    # trapezoid's discarded corruption margin).
    align = 8 if nd == 2 else 1
    halo = -((2 * T) // -align) * align
    assert B % align == 0 and X % align == 0, (nd, B, X)
    # one extra buffer row when X - ext would be odd, so every slab start
    # can stay even (block-invariant checkerboard parity) while the top
    # slab still reaches the upper boundary row
    ext = B + 2 * halo
    ext += (X - ext) % 2
    assert X >= ext, f"axis0 extent {X} smaller than slab+halos {ext}"
    # wrap storage: in-kernel rolls wrap within the local ext buffer, not
    # the global array, so the +axis0 neighbor of global row X-1 (which
    # must read the zero boundary plane) needs extra always-zero rows
    # appended to the scratch buffers (`align` of them, so 2D slices of
    # the zero-row block stay sublane-aligned).  Harmless for non-top
    # slabs (the zero rows sit in the discarded corruption region).
    zrow = align if geom.wrap else 0
    loc_rows = ext + zrow
    # the loop covers full B-row slabs only; remainder rows must all be
    # boundary/padding (true for 2^k+1 grids with power-of-two B) and are
    # passed through unchanged outside the kernel
    nblk = X // B
    rem_start = nblk * B
    assert rem_start >= geom.shape[0] - 1, (
        f"slab remainder rows [{rem_start}, {X}) contain interior points"
    )
    tail = tuple(shape[1:])

    # all slab starts are even (B and halo are even, X - ext is even by
    # construction), so the checkerboard parity masks are block-invariant
    # and are computed ONCE per kernel invocation — only a rank-1
    # x-row-validity factor varies per block.
    assert B % 2 == 0 and halo % 2 == 0 and (X - ext) % 2 == 0
    max_start = X - ext

    def kernel(*refs, nsweeps_here, with_f):
        if with_f:
            (v_hbm, f_hbm, o_hbm, vbuf, fbuf,
             mred_ref, mblack_ref, in_sem, out_sem) = refs
        else:
            # statically-zero RHS (f_zero leg): the f stream vanishes
            (v_hbm, o_hbm, vbuf,
             mred_ref, mblack_ref, in_sem, out_sem) = refs
            f_hbm = fbuf = None
        # offsets are computed in units of `align` and scaled back up, so
        # Mosaic can PROVE sublane-tile divisibility of the dynamic slice
        # starts (a bare clip() result is 8-divisible in value but not
        # provably so)
        def start_units(p):
            return jnp.clip(
                p * (B // align) - halo // align, 0, max_start // align
            )

        def start_of(p):
            return start_units(p) * align

        def in_dmas(slot, p):
            s = start_of(p)
            dmas = [
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(s, ext)],
                    vbuf.at[slot, pl.ds(0, ext)],
                    in_sem.at[slot, 0],
                )
            ]
            if with_f:
                dmas.append(
                    pltpu.make_async_copy(
                        f_hbm.at[pl.ds(s, ext)],
                        fbuf.at[slot, pl.ds(0, ext)],
                        in_sem.at[slot, 1],
                    )
                )
            return dmas

        def out_dma(slot, p):
            off = (p * (B // align) - start_units(p)) * align
            return pltpu.make_async_copy(
                vbuf.at[slot, pl.ds(off, B)],
                o_hbm.at[pl.ds(p * B, B)],
                out_sem.at[slot],
            )

        if zrow:
            # the extra always-zero row is never DMA'd over; set it once
            zeros = jnp.zeros((zrow,) + tail, dtype)
            vbuf[0, ext:] = zeros
            vbuf[1, ext:] = zeros
            if with_f:
                fbuf[0, ext:] = zeros
                fbuf[1, ext:] = zeros
        for d in in_dmas(0, 0):
            d.start()

        # hoisted per-invocation masks: parity + tail-dim interiority
        # (x-interiority is per block, applied below).  Staged through VMEM
        # scratch so the fori_loop body loads them instead of carrying
        # multi-MB vector values across the loop boundary.
        lshape = (loc_rows,) + tail
        iotas = [
            lax.broadcasted_iota(jnp.int32, lshape, d) for d in range(nd)
        ]
        ok_tail = None
        for d in range(1, nd):
            ok = (iotas[d] >= 1) & (iotas[d] <= geom.shape[d] - 2)
            ok_tail = ok if ok_tail is None else ok_tail & ok
        par = sum(iotas) % 2
        mred_ref[:] = ((par == 0) & ok_tail).astype(dtype)
        mblack_ref[:] = ((par == 1) & ok_tail).astype(dtype)

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            # prefetch slab p+1 into the other slot; its buffer is free
            # once the p-1 write-back has drained
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
            g = s + lax.broadcasted_iota(
                jnp.int32, (loc_rows,) + (1,) * (nd - 1), 0
            )
            rv = ((g >= 1) & (g <= geom.shape[0] - 2)).astype(dtype)
            m_red = mred_ref[:] * rv
            m_black = mblack_ref[:] * rv
            # problem keep-mask hook (HJB pinned target ball): extra
            # never-update points beyond the geometric boundary — must be
            # applied per block (it depends on axis-0 coordinates too)
            keep_fn = getattr(problem, "kernel_keep_mask", None)
            if keep_fn is not None:
                k = keep_fn(
                    _local_coords(geom, lshape, s, dtype), geom, dtype
                )
                m_red = m_red * k
                m_black = m_black * k
            pre = _coords_pre(problem, geom, lshape, s, dtype)
            v_new = _sweeps(
                problem,
                geom,
                vbuf[slot],
                fbuf[slot] if with_f else None,
                pre,
                m_red,
                m_black,
                nsweeps_here,
            )
            # dynamic_slice of a value is not lowerable on TPU; stage the
            # result through the ref and DMA the owned rows out.  Static
            # slice [:ext] keeps the trailing always-zero row intact for
            # this slot's next turn (the sweep "updates" it as if it were
            # interior whenever the slab isn't the top one).
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
    def build(nsweeps_here: int, with_f: bool = True):
        nin = 2 if with_f else 1
        vmem = [pltpu.VMEM((2, loc_rows) + tail, dtype)]
        if with_f:
            vmem.append(pltpu.VMEM((2, loc_rows) + tail, dtype))
        call = pl.pallas_call(
            functools.partial(
                kernel, nsweeps_here=nsweeps_here, with_f=with_f
            ),
            out_shape=jax.ShapeDtypeStruct((rem_start,) + tail, dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nin,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=vmem + [
                pltpu.VMEM((loc_rows,) + tail, dtype),
                pltpu.VMEM((loc_rows,) + tail, dtype),
                pltpu.SemaphoreType.DMA((2, nin)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )
        if rem_start == X:
            return call

        def with_tail(v, *fs):
            body = call(v, *fs)
            return jnp.concatenate([body, v[rem_start:]], axis=0)

        return with_tail

    def relax(v, f, nsweeps: int, f_zero: bool = False):
        fs = () if f_zero else (f,)
        n_full, rem = divmod(nsweeps, T)
        if n_full:
            full = build(T, not f_zero)
            if n_full == 1:
                v = full(v, *fs)
            else:
                v = lax.fori_loop(
                    0, n_full, lambda _, vv: full(vv, *fs), v
                )
        if rem:
            v = build(rem, not f_zero)(v, *fs)
        return v

    relax.supports_f_zero = bool(
        getattr(problem, "kernel_update_f_optional", False)
    )
    return relax


# ------------------------------------------------- merged-layout resident

def make_merged_resident_relax(
    problem, geom: LevelGeometry, dtype, interpret=False
):
    """Resident kernel for wrap-mode 3D levels whose lane extent is < 128:
    the stored (X, Y, Z) array is VIEWED as (X, Y*Z/128, 128) — a free
    bitcast with perfect (8,128) tiling and zero VMEM padding waste.

    Geometric shifts become flat shifts over the merged (y,z) dimension:
    shifting by s = Z (y-step) or s = 1 (z-step) crosses merged-row
    boundaries with a row-carry.  Wrap correctness is preserved because
    every cross-boundary carry lands on a zero boundary plane: the +z
    neighbor of z = Z-1 should read the zero z-boundary and the carry
    delivers (y+1, 0) — also a zero boundary value; likewise +y wraps to
    the y=0 plane.  Requires problem.merged_update (constant-coefficient
    operators; Poisson implements it)."""
    X, Y, Z = geom.padded_shape
    assert geom.wrap and Z < 128 and (Y * Z) % 128 == 0
    M = (Y * Z) // 128
    zbits = Z.bit_length() - 1
    lane = None  # built in-kernel

    def flat_shift(a, s: int):
        """out[flat] = a[flat + s] over the merged (y,z) space, per x."""
        if s == 0:
            return a
        b = jnp.roll(a, -s, axis=2)
        if s > 0:
            c = jnp.roll(b, -1, axis=1)
            return jnp.where(lane < 128 - s, b, c)
        c = jnp.roll(b, 1, axis=1)
        return jnp.where(lane >= -s, b, c)

    def geom_shift(a, axis: int, off: int):
        if axis == 0:
            return jnp.roll(a, -off, axis=0)
        if axis == 1:
            return flat_shift(a, off * Z)
        return flat_shift(a, off)

    def kernel(v_ref, f_ref, o_ref, *, nsweeps):
        nonlocal lane
        shape = (X, M, 128)
        lane = lax.broadcasted_iota(jnp.int32, shape, 2)
        m_i = lax.broadcasted_iota(jnp.int32, shape, 1)
        flat = m_i * 128 + lane
        gx = lax.broadcasted_iota(jnp.int32, shape, 0)
        gy = flat >> zbits
        gz = flat & (Z - 1)
        interior = (gx >= 1) & (gy >= 1) & (gz >= 1)
        par = (gx + gy + gz) % 2
        m_red = ((par == 0) & interior).astype(dtype)
        m_black = ((par == 1) & interior).astype(dtype)
        f = f_ref[:]

        def upd(v):
            return problem.merged_update(v, f, geom_shift, geom)

        def one(_, v):
            v = v + m_red * (upd(v) - v)
            v = v + m_black * (upd(v) - v)
            return v

        o_ref[:] = (
            one(0, v_ref[:])
            if nsweeps == 1
            else lax.fori_loop(0, nsweeps, one, v_ref[:])
        )

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps),
            out_shape=jax.ShapeDtypeStruct((X, M, 128), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def relax(v, f, nsweeps: int):
        vm = v.reshape(X, M, 128)
        fm = f.reshape(X, M, 128)
        return build(nsweeps)(vm, fm).reshape(X, Y, Z)

    return relax


def make_split_merged_relax(problem, geom: LevelGeometry, dtype, interpret=False):
    """Color-split resident kernel in merged layout (wrap-mode 3D, Z < 128).

    Combines the two coarse-level tricks: color-split storage (half the
    arithmetic of the dense masked update — every gathered neighbor is
    used) and the merged (X, Y2*Z/128, 128) view (zero tile waste for
    sub-lane Z).  Unlike the slab split kernels no appended zero rows are
    needed: with the FULL arrays resident, every wrapping roll lands on a
    stored zero boundary plane —

      * x-roll wraps x=X-1 -> x=0, the dense x=0 boundary plane;
      * z-step +1 at z=Z-1 carries to (j+1, 0), the dense z=0 plane;
      * j-step +Z at j=Y2-1 wraps to j=0 which, at the (x,z) parities
        that take the +j branch (q=1), holds dense y=0 — the boundary.

    Replaces make_merged_resident_relax where problem.split_update exists
    (constant-coefficient); reference op: the colored update loops of
    MultiGrid3D.cpp:515-566 / MultiGrid3D.cu:556-654."""
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    assert geom.wrap and Z < 128 and (Y2 * Z) % 128 == 0
    M2 = (Y2 * Z) // 128
    zbits = Z.bit_length() - 1
    qb_np = _split_qmask(X, Z)

    def kernel(r_ref, b_ref, fr_ref, fb_ref, ro_ref, bo_ref, *, nsweeps):
        shape = (X, M2, 128)
        lane = lax.broadcasted_iota(jnp.int32, shape, 2)
        flat = lax.broadcasted_iota(jnp.int32, shape, 1) * 128 + lane
        gx = lax.broadcasted_iota(jnp.int32, shape, 0)
        gj = flat >> zbits
        gz = flat & (Z - 1)
        q1 = ((gx + gz) % 2) == 1
        ok = (gx >= 1) & (gz >= 1)
        m_r = (((gj >= 1) | q1) & ok).astype(dtype)
        m_b = (((gj >= 1) | ~q1) & ok).astype(dtype)
        fr, fb = fr_ref[:], fb_ref[:]

        def fshift(a, s: int):
            b = jnp.roll(a, -s, axis=2)
            # M2 == 1: the carry roll over merged rows is the identity
            # (and lowers to a zero-size slice Mosaic rejects)
            def carry(x, d):
                return x if M2 == 1 else jnp.roll(x, d, axis=1)

            if s > 0:
                return jnp.where(lane < 128 - s, b, carry(b, -1))
            return jnp.where(lane >= -s, b, carry(b, 1))

        def one(_, rb):
            r, b = rb
            pairs = (
                jnp.roll(b, 1, axis=0) + jnp.roll(b, -1, axis=0),
                b + jnp.where(q1, fshift(b, Z), fshift(b, -Z)),
                fshift(b, -1) + fshift(b, 1),
            )
            r = r + m_r * (problem.split_update(pairs, fr, geom) - r)
            pairs = (
                jnp.roll(r, 1, axis=0) + jnp.roll(r, -1, axis=0),
                r + jnp.where(q1, fshift(r, -Z), fshift(r, Z)),
                fshift(r, -1) + fshift(r, 1),
            )
            b = b + m_b * (problem.split_update(pairs, fb, geom) - b)
            return r, b

        r0, b0 = r_ref[:], b_ref[:]
        ro_ref[:], bo_ref[:] = (
            one(0, (r0, b0))
            if nsweeps == 1
            else lax.fori_loop(0, nsweeps, one, (r0, b0))
        )

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps),
            out_shape=(
                jax.ShapeDtypeStruct((X, M2, 128), dtype),
                jax.ShapeDtypeStruct((X, M2, 128), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )

    def relax(v, f, nsweeps: int):
        r, b = split_colors(v, qb_np)
        fr, fb = split_colors(f, qb_np)
        call = build(nsweeps)
        ro, bo = call(
            r.reshape(X, M2, 128),
            b.reshape(X, M2, 128),
            fr.reshape(X, M2, 128),
            fb.reshape(X, M2, 128),
        )
        return merge_colors(
            ro.reshape(X, Y2, Z), bo.reshape(X, Y2, Z), qb_np
        )

    return relax


# ---------------------------------------------- masked block (shard-local)


def make_masked_block_relax(
    problem, geom: LevelGeometry, dtype, block_shape, pre_keys, interpret=False
):
    """relax(v_ext, f_ext, pre, m_red, m_black, nsweeps) for a VMEM-sized
    local block whose masks/coefficients arrive as INPUTS.

    Built for shard_map shards (parallel/halo.py): the shard's global row
    offset is a traced value (lax.axis_index), so masks cannot be folded
    into the kernel at trace time like the single-chip kernels do; they
    are computed once per relax leg outside (amortized over all sweeps)
    and streamed in.  The sweep loop itself — the hot path — runs in one
    kernel invocation with a single HBM round trip."""
    shape = tuple(block_shape)
    pre_keys = tuple(pre_keys)

    def kernel(*refs, nsweeps):
        v_ref, f_ref, mr_ref, mb_ref = refs[:4]
        pre = {k: r[:] for k, r in zip(pre_keys, refs[4 : 4 + len(pre_keys)])}
        o_ref = refs[-1]
        o_ref[:] = _sweeps(
            problem,
            geom,
            v_ref[:],
            f_ref[:],
            pre,
            mr_ref[:],
            mb_ref[:],
            nsweeps,
        )

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (4 + len(pre_keys)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    def relax(v_ext, f_ext, pre, m_red, m_black, nsweeps: int):
        args = [v_ext, f_ext, m_red, m_black] + [pre[k] for k in pre_keys]
        return build(nsweeps)(*args)

    return relax


# ------------------------------------------------- split-color slab kernel


def _split_qmask(X: int, Z: int):
    """numpy bool (X, 1, Z): q(x, z) = (x + z) % 2 == 1.  Red points of
    row (x, z) live at y = 2j + q, black at y = 2j + 1 - q."""
    import numpy as np

    return (
        (np.arange(X)[:, None, None] + np.arange(Z)[None, None, :]) % 2
    ) == 1


def split_colors(v, qb):
    """(X, Y, Z) dense -> (R, B) color-split (X, Y/2, Z) arrays."""
    X, Y, Z = v.shape
    v4 = v.reshape(X, Y // 2, 2, Z)
    v0, v1 = v4[:, :, 0, :], v4[:, :, 1, :]
    return jnp.where(qb, v1, v0), jnp.where(qb, v0, v1)


def merge_colors(r, b, qb):
    """Inverse of split_colors."""
    X, Y2, Z = r.shape
    v0 = jnp.where(qb, b, r)
    v1 = jnp.where(qb, r, b)
    return jnp.stack([v0, v1], axis=2).reshape(X, 2 * Y2, Z)


# ------------------------------------- pallas color conversions (MXU picks)
#
# XLA's generated code for split_colors/merge_colors (strided y gathers +
# selects) runs 20-60x below the HBM roofline on this backend — measured
# ~5 ms per conversion at 256^3 vs a ~163 us traffic floor, which made the
# conversions (2 per relax leg) the dominant cost of the 257^3 FMG step.
# These kernels stream x-slabs through VMEM with an automatically
# pipelined BlockSpec grid and do the even/odd y extraction as MXU dots
# with 0/1 pick matrices.  EXACT: each output is 1.0 * v[y*] for a single
# y*, and the data side is split into THREE bf16 terms (8 mantissa bits
# each covers f32's 24; the MXU casts operands to bf16, so a two-term
# hi/lo split would silently drop the low 8 bits — measured as a 48x
# higher residual floor at 257^3).  Each partial product is a single
# 1.0 * term, f32-accumulated, so reconstruction is bitwise.


def _exact_pick_dot(p, a):
    """p @ a for a 0/1 single-entry-per-row pick matrix p, bitwise-exact
    on the bf16 MXU via a three-term bf16 decomposition of `a`."""
    h1 = a.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = a - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    h3 = r1 - h2
    return (
        jnp.dot(p, h1, preferred_element_type=jnp.float32)
        + jnp.dot(p, h2, preferred_element_type=jnp.float32)
        + jnp.dot(p, h3, preferred_element_type=jnp.float32)
    )


def _conv_rows(X: int, Y: int, Z: int) -> int:
    """x-slab rows for the conversion kernels under the VMEM model
    ~7 * B * plane (double-buffered in + out blocks + dot temps)."""
    plane = Y * Z * 4
    for B in (16, 8, 4, 2):
        if X % B == 0 and plane * 7 * B <= SLAB_VMEM_BUDGET:
            return B
    return 1


@functools.lru_cache(maxsize=None)
def _pallas_split(X: int, Y: int, Z: int, dtype, interpret=False):
    """split(v) -> (r, b), the pallas tier of split_colors (3D wrap,
    lane-aligned levels: Z % 128 == 0, Y2 % 8 == 0)."""
    Y2 = Y // 2
    assert Z % 128 == 0 and Y2 % 8 == 0
    B = _conv_rows(X, Y, Z)
    # stacked transposed picks: rows [0, Y2) extract even y, [Y2, 2*Y2) odd
    pt = np.zeros((2 * Y2, Y), np.float32)
    pt[np.arange(Y2), 2 * np.arange(Y2)] = 1.0
    pt[Y2 + np.arange(Y2), 2 * np.arange(Y2) + 1] = 1.0
    pt = jnp.asarray(pt)

    def kernel(v_ref, pt_ref, r_ref, b_ref):
        x0 = pl.program_id(0) * B
        iz = lax.broadcasted_iota(jnp.int32, (Y2, Z), 1)
        for i in range(B):
            s = _exact_pick_dot(pt_ref[:], v_ref[i])
            q1 = ((x0 + i + iz) % 2) == 1
            r_ref[i] = jnp.where(q1, s[Y2:], s[:Y2])
            b_ref[i] = jnp.where(q1, s[:Y2], s[Y2:])

    return pl.pallas_call(
        kernel,
        grid=(X // B,),
        in_specs=[
            pl.BlockSpec((B, Y, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * Y2, Y), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, Y2, Z), dtype),
            jax.ShapeDtypeStruct((X, Y2, Z), dtype),
        ),
        interpret=interpret,
    ), pt


@functools.lru_cache(maxsize=None)
def _pallas_merge(X: int, Y: int, Z: int, dtype, interpret=False):
    """merge(r, b) -> v, the pallas tier of merge_colors."""
    Y2 = Y // 2
    assert Z % 128 == 0 and Y2 % 8 == 0
    B = _conv_rows(X, Y, Z)
    # interleave picks: v[2j] = v0[j], v[2j+1] = v1[j] with
    # s = [v0; v1] stacked on the sublane dim
    u = np.zeros((Y, 2 * Y2), np.float32)
    u[2 * np.arange(Y2), np.arange(Y2)] = 1.0
    u[2 * np.arange(Y2) + 1, Y2 + np.arange(Y2)] = 1.0
    u = jnp.asarray(u)

    def kernel(r_ref, b_ref, u_ref, v_ref):
        x0 = pl.program_id(0) * B
        iz = lax.broadcasted_iota(jnp.int32, (Y2, Z), 1)
        for i in range(B):
            r, b = r_ref[i], b_ref[i]
            q1 = ((x0 + i + iz) % 2) == 1
            s = jnp.concatenate(
                [jnp.where(q1, b, r), jnp.where(q1, r, b)], axis=0
            )
            v_ref[i] = _exact_pick_dot(u_ref[:], s)

    return pl.pallas_call(
        kernel,
        grid=(X // B,),
        in_specs=[
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((Y, 2 * Y2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, Y, Z), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), dtype),
        interpret=interpret,
    ), u


def make_color_converters(
    geom: LevelGeometry, dtype, interpret=False, shape=None
):
    """(split, merge) pair for one level: pallas tier when lane-aligned,
    XLA fallback otherwise.  `shape` overrides the level's padded shape
    (shard-local slabs, parallel/halo.py): color parity stays global as
    long as the local axis-0 extent is even."""
    X, Y, Z = shape if shape is not None else geom.padded_shape
    if Z % 128 == 0 and (Y // 2) % 8 == 0:
        sc, pt = _pallas_split(X, Y, Z, dtype, interpret)
        mc, u = _pallas_merge(X, Y, Z, dtype, interpret)
        return (lambda v: sc(v, pt)), (lambda r, b: mc(r, b, u))
    qb = _split_qmask(X, Z)
    return (lambda v: split_colors(v, qb)), (
        lambda r, b: merge_colors(r, b, qb)
    )


def make_split_slab_relax(
    problem,
    geom: LevelGeometry,
    dtype,
    slab_rows: int,
    sweeps_per_call: int = 1,
    interpret=False,
    raw: bool = False,
    compute_dtype=None,
):
    """Double-buffered slab relaxation on COLOR-SPLIT storage (3D, wrap).

    The dense masked kernels compute the full stencil update at every
    point and then discard the half belonging to the other color — 2x
    redundant arithmetic.  Here red/black points are stored as separate
    (X, Y/2, Z) arrays (split along y; with q = (x+z) % 2, red y = 2j+q):
    every neighbor of a red point is black and vice versa, so each
    half-sweep computes exactly the points it updates.  All neighbor
    gathers are plain rolls except the y pair, which needs one select on
    the (x, z) parity:

        red   y-pair = B[j] + (q ? B[j+1] : B[j-1])
        black y-pair = R[j] + (q ? R[j-1] : R[j+1])

    y/z rolls wrap within the fully-local split arrays and land on the
    stored zero boundary planes, so wrap correctness carries over; the
    x-axis uses the same trapezoidal slab + appended-zero-row scheme as
    make_slab_relax (T = sweeps_per_call local sweeps per HBM round
    trip, 2T-row halos — with the arithmetic halved the kernel sits at
    the HBM read roofline, so T > 1 trades a little redundant halo
    compute for 1/T of the traffic).  Requires problem.split_update
    (constant-coefficient pair-sum solve).

    Replaces the reference's CUDARelax (MultiGrid3D.cu:609-675) for the
    3D Poisson family at ~half the arithmetic per sweep.

    compute_dtype decouples the HBM/VMEM storage word from the sweep
    arithmetic: with dtype=bf16 + compute_dtype=f32 the slabs stream at
    half the f32 traffic but the sweeps run as f32 vector ops — measured
    on v5e, bf16 *arithmetic* is ~2x slower per op than f32 (each bf16
    elementwise op pays pack/unpack), so casting at the slab boundary
    keeps the kernel at the halved read roofline (defect.py's inner
    smoother).
    """
    assert geom.wrap and geom.ndim == 3
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    B = slab_rows
    T = sweeps_per_call
    cdt = jnp.dtype(compute_dtype or dtype)
    halo = 2 * T
    ext = B + 2 * halo
    assert B % 2 == 0 and X % 2 == 0 and X >= ext and X % B == 0
    loc = ext + 1  # + appended always-zero x-wrap row
    nblk = X // B
    max_start = X - ext
    tail = (Y2, Z)

    def kernel(*refs, nsweeps_here, with_v):
        # with_v=False: the iterate halves are statically zero (first
        # chunk of a defect-correction leg: error E_0 = 0) — their HBM
        # streams vanish and sweeps start from in-register zeros.
        if with_v:
            (rv_hbm, bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm,
             rvb, bvb, rfb, bfb, mr_ref, mb_ref, in_sem, out_sem) = refs
        else:
            (rf_hbm, bf_hbm, ro_hbm, bo_hbm,
             rvb, bvb, rfb, bfb, mr_ref, mb_ref, in_sem, out_sem) = refs
        bufs = (rvb, bvb, rfb, bfb) if with_v else (rfb, bfb)
        hbms = (
            (rv_hbm, bv_hbm, rf_hbm, bf_hbm)
            if with_v
            else (rf_hbm, bf_hbm)
        )

        def start_of(p):
            return jnp.clip(p * B - halo, 0, max_start)

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

        def out_dmas(slot, p):
            s = start_of(p)
            off = p * B - s
            return [
                pltpu.make_async_copy(
                    b.at[slot, pl.ds(off, B)],
                    h.at[pl.ds(p * B, B)],
                    out_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(((ro_hbm, rvb), (bo_hbm, bvb)))
            ]

        zeros = jnp.zeros((1,) + tail, dtype)
        for b in bufs:
            b[0, ext:] = zeros
            b[1, ext:] = zeros
        for d in in_dmas(0, 0):
            d.start()

        # hoisted (block-invariant: all starts even): local q parity and
        # per-color y/z interiority; x-validity applied per block
        lshape = (loc,) + tail
        ix = lax.broadcasted_iota(jnp.int32, (loc, 1, Z), 0)
        iz = lax.broadcasted_iota(jnp.int32, (loc, 1, Z), 2)
        q1 = ((ix + iz) % 2) == 1
        jj = lax.broadcasted_iota(jnp.int32, (1, Y2, 1), 1)
        ok_z = iz >= 1
        mr_ref[:] = jnp.broadcast_to(
            ((jj >= 1) | q1) & ok_z, lshape
        ).astype(cdt)
        mb_ref[:] = jnp.broadcast_to(
            ((jj >= 1) | ~q1) & ok_z, lshape
        ).astype(cdt)

        def roll(a, ax, off):
            return jnp.roll(a, -off, axis=ax)

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            @pl.when(p + 1 < nblk)
            def _():
                @pl.when(p >= 1)
                def _():
                    for d in out_dmas(nxt, p - 1):
                        d.wait()

                for d in in_dmas(nxt, p + 1):
                    d.start()

            for d in in_dmas(slot, p):
                d.wait()
            s = start_of(p)
            g = s + lax.broadcasted_iota(jnp.int32, (loc, 1, 1), 0)
            rv_x = ((g >= 1) & (g <= geom.shape[0] - 2)).astype(cdt)
            m_r = mr_ref[:] * rv_x
            m_b = mb_ref[:] * rv_x
            if with_v:
                r = rvb[slot].astype(cdt)
                b = bvb[slot].astype(cdt)
            else:
                r = jnp.zeros((loc,) + tail, cdt)
                b = jnp.zeros((loc,) + tail, cdt)
            fr, fb = rfb[slot].astype(cdt), bfb[slot].astype(cdt)

            def one_sweep(_, rb):
                r, b = rb
                # red half-sweep (reads black)
                pairs = (
                    roll(b, 0, -1) + roll(b, 0, +1),
                    b + jnp.where(q1, roll(b, 1, +1), roll(b, 1, -1)),
                    roll(b, 2, -1) + roll(b, 2, +1),
                )
                upd = problem.split_update(pairs, fr, geom)
                r = r + m_r * (upd - r)
                # black half-sweep (reads updated red)
                pairs = (
                    roll(r, 0, -1) + roll(r, 0, +1),
                    r + jnp.where(q1, roll(r, 1, -1), roll(r, 1, +1)),
                    roll(r, 2, -1) + roll(r, 2, +1),
                )
                upd = problem.split_update(pairs, fb, geom)
                b = b + m_b * (upd - b)
                return r, b

            if nsweeps_here == 1:
                r, b = one_sweep(0, (r, b))
            else:
                r, b = lax.fori_loop(0, nsweeps_here, one_sweep, (r, b))
            rvb[slot, :ext] = r[:ext].astype(dtype)
            bvb[slot, :ext] = b[:ext].astype(dtype)
            for d in out_dmas(slot, p):
                d.start()
            return 0

        lax.fori_loop(0, nblk, body, 0)
        for d in out_dmas((nblk - 1) % 2, nblk - 1):
            d.wait()
        if nblk > 1:
            for d in out_dmas((nblk - 2) % 2, nblk - 2):
                d.wait()

    @functools.lru_cache(maxsize=None)
    def build(nsweeps_here: int, with_v: bool = True):
        nin = 4 if with_v else 2
        return pl.pallas_call(
            functools.partial(
                kernel, nsweeps_here=nsweeps_here, with_v=with_v
            ),
            out_shape=(
                jax.ShapeDtypeStruct((X,) + tail, dtype),
                jax.ShapeDtypeStruct((X,) + tail, dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nin,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, loc) + tail, dtype),
                pltpu.VMEM((2, loc) + tail, dtype),
                pltpu.VMEM((2, loc) + tail, dtype),
                pltpu.VMEM((2, loc) + tail, dtype),
                pltpu.VMEM((loc,) + tail, cdt),
                pltpu.VMEM((loc,) + tail, cdt),
                pltpu.SemaphoreType.DMA((2, nin)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )

    def relax_raw(r, b, fr, fb, nsweeps: int, v_zero: bool = False):
        """Sweep already-color-split (X, Y/2, Z) arrays (defect.py feeds
        this with bf16 error/residual halves).  v_zero=True: r/b are
        statically zero (pass None) — the first chunk runs without their
        HBM streams, starting from in-register zeros."""
        n_full, rem = divmod(nsweeps, T)
        if v_zero:
            t0 = T if n_full else rem
            r, b = build(t0, False)(fr, fb)
            left = nsweeps - t0
            n_full, rem = divmod(left, T)
        if n_full:
            full = build(T)
            if n_full == 1:
                r, b = full(r, b, fr, fb)
            else:
                r, b = lax.fori_loop(
                    0,
                    n_full,
                    lambda _, rb: full(rb[0], rb[1], fr, fb),
                    (r, b),
                )
        if rem:
            r, b = build(rem)(r, b, fr, fb)
        return r, b

    relax_raw.supports_v_zero = True
    if raw:
        return relax_raw

    csplit, cmerge = make_color_converters(geom, dtype, interpret)

    def relax(v, f, nsweeps: int):
        r, b = csplit(v)
        fr, fb = csplit(f)
        r, b = relax_raw(r, b, fr, fb, nsweeps)
        return cmerge(r, b)

    return relax


def make_split_resident_sweeps(
    problem,
    geom: LevelGeometry,
    dtype,
    block_rows: int = 8,
    interpret=False,
    compute_dtype=jnp.float32,
    iterate_dtype=None,
):
    """ALL-sweeps-resident error-equation smoother on color-split storage.

    (er, eb) = S^nu(0; rr, rb): nu red-black sweeps of the homogeneous-
    Dirichlet error equation starting from E_0 = 0, with all four
    color-split halves RESIDENT in VMEM for the whole leg.  With bf16
    residual halves a 129^3-class level fits comfortably, so the leg
    costs ONE HBM round trip (read rr/rb, write er/eb) regardless of nu,
    where the slab kernel pays ~6 B/point/sweep.  The smoother-leg
    roofline collapses from HBM bandwidth to VPU arithmetic — so the
    inner loop is op-count-tuned:

    - `iterate_dtype` (default `dtype`) sets the ERROR halves' storage:
      f32 iterate + bf16 residual removes every pack/unpack cast from
      the sweep body (the residual cast remains, 1 op/point/sweep) at
      the cost of doubling the iterate halves' VMEM.
    - parity/interiority masks are hoisted out of the sweep loop (the
      window parity pattern is block-independent because B is even),
      and updates are written as `where(ok, upd, 0)` instead of a
      masked blend — valid because masked-off points of the error are
      identically zero.  The x-interiority term is dropped from the
      mask entirely: the only stored non-interior x row is global row 0
      (wrap storage), which is re-zeroed once per half-sweep, before
      the other color reads it.
    - x-neighbors come from static slices of the (B+2)-row window (the
      halves carry one always-zero padding row at each x end, so edge
      windows read zeros — the error equation's Dirichlet data), not
      from rolls; only y/z use lane/sublane rotates.

    Each color phase runs over ALL blocks before the other color
    starts: exactly the jnp tier's global red->black ordering, so
    results match ops.stencil.relax_rbgs on the error equation (modulo
    iterate quantization when iterate_dtype is narrower than f32).

    Replaces the reference's per-sweep CUDARelax launches
    (MultiGrid3D.cu:609-675) at the opposite design point: one launch
    per LEG with zero intra-leg HBM traffic.
    """
    assert geom.wrap and geom.ndim == 3
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    cdt = jnp.dtype(compute_dtype or dtype)
    idt = jnp.dtype(iterate_dtype or dtype)
    B = block_rows
    assert X % B == 0 and B % 2 == 0
    assert interpret or (Z % 128 == 0 and Y2 % 8 == 0)
    # wrap storage: row 0 is the only stored non-interior x row (the
    # re-zero-row-0 scheme below relies on this)
    assert geom.shape[0] - 2 == X - 1
    ext = B + 2
    nblk = X // B
    tail = (Y2, Z)
    # constant-folded local solve when the problem provides one (fewer
    # VPU ops; PDE_MG_RESIDENT_FOLDED=0 keeps split_update for A/Bs)
    upd_fn = problem.split_update
    if os.environ.get("PDE_MG_RESIDENT_FOLDED", "1") == "1":
        upd_fn = getattr(problem, "split_update_folded", upd_fn)

    def kernel(
        rr_hbm, rb_hbm, er_hbm, eb_hbm,
        ers, ebs, rrs, rbs, in_sem, out_sem,
        *, nsweeps,
    ):
        cp_in = [
            pltpu.make_async_copy(rr_hbm, rrs, in_sem.at[0]),
            pltpu.make_async_copy(rb_hbm, rbs, in_sem.at[1]),
        ]
        for c in cp_in:
            c.start()
        # zero-init the error halves, including both padding rows (rows
        # 0 and X+1; data rows i+1 hold global row i)
        zeros = jnp.zeros((B,) + tail, idt)
        zrow = jnp.zeros((1,) + tail, idt)

        def zinit(p, _):
            ers[pl.ds(p * B + 1, B)] = zeros
            ebs[pl.ds(p * B + 1, B)] = zeros
            return 0

        lax.fori_loop(0, nblk, zinit, 0)
        for buf in (ers, ebs):
            buf[0:1] = zrow
            buf[pl.ds(X + 1, 1)] = zrow
        for c in cp_in:
            c.wait()

        # hoisted masks (block-independent: B is even, so the own-row
        # parity pattern repeats across blocks)
        izo = lax.broadcasted_iota(jnp.int32, (B, 1, Z), 2)
        go = lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0)
        q1o = ((go + izo) % 2) == 1
        jj = lax.broadcasted_iota(jnp.int32, (1, Y2, 1), 1)
        okz = izo >= 1
        # masked-off error points are identically zero, so the masked
        # write could be a plain f32 multiply — but hardware A/B (129^3,
        # interleaved) measured where-with-hoisted-BOOL-mask faster than
        # the f32 broadcast multiply (9.7-10.1 vs 10.6-10.8 us/sweep);
        # the broadcast mask pays VMEM-load bandwidth the bool does not.
        # (The 2D slab kernel measured the OPPOSITE: see use_sel there.)
        sel = os.environ.get("PDE_MG_RESIDENT_MASK", "where")
        ok_r = ((jj >= 1) | q1o) & okz
        ok_b = ((jj >= 1) | ~q1o) & okz
        if sel == "mul":
            ok_r = jnp.broadcast_to(ok_r, (B,) + tail).astype(cdt)
            ok_b = jnp.broadcast_to(ok_b, (B,) + tail).astype(cdt)
        zero_c = jnp.zeros((), cdt)
        own = slice(1, B + 1)

        def phase_body(red):
            src, dst = (ebs, ers) if red else (ers, ebs)
            rhs = rrs if red else rbs
            ok = ok_r if red else ok_b

            def body(p, _):
                s = p * B  # padded window start == global p*B - 1
                w = src[pl.ds(s, ext)]
                if w.dtype != cdt:
                    w = w.astype(cdt)
                wo = w[own]
                px = w[0:B] + w[2:ext]
                if red:
                    py = wo + jnp.where(
                        q1o, jnp.roll(wo, -1, 1), jnp.roll(wo, 1, 1)
                    )
                else:
                    py = wo + jnp.where(
                        q1o, jnp.roll(wo, 1, 1), jnp.roll(wo, -1, 1)
                    )
                pz = jnp.roll(wo, 1, 2) + jnp.roll(wo, -1, 2)
                fr = rhs[pl.ds(p * B, B)].astype(cdt)
                upd = upd_fn((px, py, pz), fr, geom)
                out = ok * upd if sel == "mul" else jnp.where(
                    ok, upd, zero_c
                )
                dst[pl.ds(s + 1, B)] = (
                    out if idt == cdt else out.astype(idt)
                )
                return 0

            return body

        def sweep(_, carry):
            lax.fori_loop(0, nblk, phase_body(True), 0)
            ers[1:2] = zrow  # global row 0 back to zero boundary data
            lax.fori_loop(0, nblk, phase_body(False), 0)
            ebs[1:2] = zrow
            return carry

        lax.fori_loop(0, nsweeps, sweep, 0)

        cp_out = [
            pltpu.make_async_copy(
                ers.at[pl.ds(1, X)], er_hbm, out_sem.at[0]
            ),
            pltpu.make_async_copy(
                ebs.at[pl.ds(1, X)], eb_hbm, out_sem.at[1]
            ),
        ]
        for c in cp_out:
            c.start()
        for c in cp_out:
            c.wait()

    @functools.lru_cache(maxsize=None)
    def build(nsweeps: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps=nsweeps),
            out_shape=(
                jax.ShapeDtypeStruct((X,) + tail, idt),
                jax.ShapeDtypeStruct((X,) + tail, idt),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((X + 2,) + tail, idt),
                pltpu.VMEM((X + 2,) + tail, idt),
                pltpu.VMEM((X,) + tail, dtype),
                pltpu.VMEM((X,) + tail, dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )

    def relax_raw(r, b, fr, fb, nsweeps: int, v_zero: bool = False):
        """Signature-compatible with make_split_slab_relax's raw form;
        the iterate halves must be statically zero (defect legs always
        start from E_0 = 0, which this kernel bakes in)."""
        assert v_zero and r is None and b is None
        return build(nsweeps)(fr, fb)

    relax_raw.supports_v_zero = True
    relax_raw.resident = True
    relax_raw.out_dtype = idt
    return relax_raw


def make_split_timeskew_relax(
    problem,
    geom: LevelGeometry,
    dtype,
    sweeps_per_call: int = 8,
    interpret=False,
    raw: bool = False,
    compute_dtype=None,
):
    """Time-skewed (parallelogram temporal-blocked) split-color RBGS.

    The trapezoidal slab kernels trade redundant halo COMPUTE for HBM
    traffic — a trade that collapses at 257^3-class levels, where VMEM
    only affords small blocks and T=2 already doubles the work
    (hardware-measured 740 vs 358 us/sweep).  This kernel instead
    pipelines a wavefront of whole (Y/2, Z) half-planes through VMEM
    ring buffers with the classic time-skew schedule: by the time plane
    x arrives, sweep s may finalize red plane x-2s+1 and black plane
    x-2s (red_s needs black_{s-1}[x-1..x+1]; black_s needs
    red_s[x-1..x+1]).  Every plane is read ONCE and written ONCE per T
    sweeps with ZERO redundant arithmetic:

        traffic/point/T-sweeps = read(black, fr, fb) + write(r, b)
                               = 10 bytes  ->  1.25 B/point/sweep at T=8

    against the trapezoidal kernels' ~14-24 B/point/sweep — the leg
    moves from HBM-bound to the VPU roofline at any level too large for
    the fully-resident kernels.

    Exactness: the schedule computes precisely the global red->black
    ordering (every red plane of sweep s is a pure function of sweep
    s-1 black planes), so results match the jnp tier's relax_rbgs up to
    the masked-write form.  Wrap storage is homogeneous-Dirichlet
    (grid.py), so all masked-off values are identically ZERO: updates
    are written as where(ok, upd, 0), the red input stream is never
    read (Gauss-Seidel fully replaces red before its first use), and
    wrap reads of planes 0 / X resolve to zeros — the ramp reads hit
    pre-zeroed ring slots (every level's plane-0 read happens before
    its slot-0 is first overwritten), and the +1-side reads are gated
    by a scalar 0/1 factor.

    Ring residency per call: black levels s=0..T (ingest ring 4, else
    3 planes), red levels s=1..T (3 planes), f halves (2T+1 planes
    each) — ~(10T + 9) half-planes, e.g. ~11.4 MB at 257^3 with T=8.

    Replaces the reference's per-sweep CUDARelax launches at the sizes
    its own CUDA headline ran (257^3, CUDA Poisson 3D/main.cu:18).
    """
    assert geom.wrap and geom.ndim == 3
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    cdt = jnp.dtype(compute_dtype or dtype)
    assert interpret or (Z % 128 == 0 and Y2 % 8 == 0)
    assert X % 2 == 0
    assert geom.shape[0] - 2 == X - 1  # wrap: only row 0 non-interior
    plane = (Y2, Z)
    # default: jnp-tier accumulation order (bitwise-tracking results);
    # PDE_MG_TIMESKEW_FOLDED=1 uses the constant-folded local solve
    upd_fn = problem.split_update
    if os.environ.get("PDE_MG_TIMESKEW_FOLDED", "0") == "1":
        upd_fn = getattr(problem, "split_update_folded", upd_fn)

    def kernel(*refs, T):
        # f rings: plane x is read until step x+2T (fb at sweep T), and
        # the prefetch for plane t+1 starts at the TOP of step t — 2T+2
        # slots keep the in-flight DMA disjoint from every live read
        FR = 2 * T + 2
        (bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm) = refs[:5]
        b0s = refs[5]
        bss = refs[6 : 6 + T]  # black sweeps 1..T, ring 3 each
        rss = refs[6 + T : 6 + 2 * T]  # red sweeps 1..T, ring 3 each
        frs, fbs, in_sem, out_sem = refs[6 + 2 * T :]

        def in_dmas(x):
            return [
                pltpu.make_async_copy(
                    bv_hbm.at[pl.ds(x, 1)],
                    b0s.at[pl.ds(lax.rem(x, 4), 1)],
                    in_sem.at[0],
                ),
                pltpu.make_async_copy(
                    rf_hbm.at[pl.ds(x, 1)],
                    frs.at[pl.ds(lax.rem(x, FR), 1)],
                    in_sem.at[1],
                ),
                pltpu.make_async_copy(
                    bf_hbm.at[pl.ds(x, 1)],
                    fbs.at[pl.ds(lax.rem(x, FR), 1)],
                    in_sem.at[2],
                ),
            ]

        # pre-zero the v rings: ramp-time reads of "plane 0 / not yet
        # born" land on zeros (correct: the stored plane 0 IS the zero
        # boundary).  Every level's plane-0 read happens before that
        # ring's slot 0 is first overwritten (plane 3 of level s is
        # born after plane 0 of level s is last read).
        zp = jnp.zeros((1,) + plane, dtype)
        for k in range(4):
            b0s[k : k + 1] = zp
        for ring in (*bss, *rss):
            for k in range(3):
                ring[k : k + 1] = zp

        jj = lax.broadcasted_iota(jnp.int32, (Y2, 1), 0)
        iz = lax.broadcasted_iota(jnp.int32, (1, Z), 1)
        okyz = (jj >= 1), (iz >= 1)
        zero_c = jnp.zeros((), cdt)

        for d in in_dmas(1):
            d.start()

        def read(ring, slot):
            a = ring[slot]
            return a.astype(cdt) if a.dtype != cdt else a

        def update(x, src_ring, rhs_ring, red, q1, ok):
            K = 4 if src_ring is b0s else 3
            c0 = read(src_ring, lax.rem(x, K))
            cm = read(src_ring, lax.rem(x - 1, K))
            cp = read(src_ring, lax.rem(x + 1, K)) * (
                x + 1 <= X - 1
            ).astype(cdt)
            px = cm + cp
            if red:
                py = c0 + jnp.where(
                    q1, jnp.roll(c0, -1, 0), jnp.roll(c0, 1, 0)
                )
            else:
                py = c0 + jnp.where(
                    q1, jnp.roll(c0, 1, 0), jnp.roll(c0, -1, 0)
                )
            pz = jnp.roll(c0, 1, 1) + jnp.roll(c0, -1, 1)
            fh = read(rhs_ring, lax.rem(x, FR))
            upd = upd_fn((px, py, pz), fh, geom)
            out = jnp.where(ok, upd, zero_c)
            return out if cdt == jnp.dtype(dtype) else out.astype(dtype)

        def step(t, carry):
            @pl.when(t <= X - 1)
            def _():
                for d in in_dmas(t):
                    d.wait()

            @pl.when(t + 1 <= X - 1)
            def _():
                for d in in_dmas(t + 1):
                    d.start()

            # every red plane of this step has parity (t+1), every
            # black plane parity t — hoist the parity/interiority masks
            # to once per STEP instead of once per update
            q1_r = ((t + 1 + iz) % 2) == 1
            q1_b = ((t + iz) % 2) == 1
            ok_r = (okyz[0] | q1_r) & okyz[1]
            ok_b = (okyz[0] | ~q1_b) & okyz[1]

            for s in range(1, T + 1):
                xr = t - (2 * s - 1)
                xb = t - 2 * s
                src_r = b0s if s == 1 else bss[s - 2]

                @pl.when((xr >= 1) & (xr <= X - 1))
                def _(s=s, xr=xr, src_r=src_r):
                    if s == T:
                        # reuse-wait: the slot we are about to write was
                        # DMA'd out when plane xr-3 was computed
                        @pl.when(xr - 3 >= 1)
                        def _():
                            pltpu.make_async_copy(
                                rss[T - 1].at[pl.ds(lax.rem(xr, 3), 1)],
                                ro_hbm.at[pl.ds(xr - 3, 1)],
                                out_sem.at[0, lax.rem(xr - 3, 3)],
                            ).wait()
                    rss[s - 1][lax.rem(xr, 3)] = update(
                        xr, src_r, frs, True, q1_r, ok_r
                    )
                    if s == T:
                        pltpu.make_async_copy(
                            rss[T - 1].at[pl.ds(lax.rem(xr, 3), 1)],
                            ro_hbm.at[pl.ds(xr, 1)],
                            out_sem.at[0, lax.rem(xr, 3)],
                        ).start()

                @pl.when((xb >= 1) & (xb <= X - 1))
                def _(s=s, xb=xb):
                    if s == T:
                        @pl.when(xb - 3 >= 1)
                        def _():
                            pltpu.make_async_copy(
                                bss[T - 1].at[pl.ds(lax.rem(xb, 3), 1)],
                                bo_hbm.at[pl.ds(xb - 3, 1)],
                                out_sem.at[1, lax.rem(xb - 3, 3)],
                            ).wait()
                    bss[s - 1][lax.rem(xb, 3)] = update(
                        xb, rss[s - 1], fbs, False, q1_b, ok_b
                    )
                    if s == T:
                        pltpu.make_async_copy(
                            bss[T - 1].at[pl.ds(lax.rem(xb, 3), 1)],
                            bo_hbm.at[pl.ds(xb, 1)],
                            out_sem.at[1, lax.rem(xb, 3)],
                        ).start()

            return carry

        lax.fori_loop(1, X + 2 * T, step, 0)

        # drain: the last 3 planes per color have un-waited out-DMAs
        for dx in range(3):
            x = X - 1 - dx
            if x < 1:
                continue
            pltpu.make_async_copy(
                rss[T - 1].at[pl.ds(x % 3, 1)],
                ro_hbm.at[pl.ds(x, 1)],
                out_sem.at[0, x % 3],
            ).wait()
            pltpu.make_async_copy(
                bss[T - 1].at[pl.ds(x % 3, 1)],
                bo_hbm.at[pl.ds(x, 1)],
                out_sem.at[1, x % 3],
            ).wait()

        # plane 0 of both outputs is the zero boundary plane
        zp_out = jnp.zeros((1,) + plane, dtype)
        # (written via the HBM refs' first plane through a small copy)
        b0s[0:1] = zp_out
        cp0 = [
            pltpu.make_async_copy(
                b0s.at[pl.ds(0, 1)], ro_hbm.at[pl.ds(0, 1)], in_sem.at[0]
            ),
            pltpu.make_async_copy(
                b0s.at[pl.ds(0, 1)], bo_hbm.at[pl.ds(0, 1)], in_sem.at[1]
            ),
        ]
        for c in cp0:
            c.start()
        for c in cp0:
            c.wait()

    @functools.lru_cache(maxsize=None)
    def build(T: int):
        FR = 2 * T + 2
        return pl.pallas_call(
            functools.partial(kernel, T=T),
            out_shape=(
                jax.ShapeDtypeStruct((X,) + plane, dtype),
                jax.ShapeDtypeStruct((X,) + plane, dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[pltpu.VMEM((4,) + plane, dtype)]
            + [pltpu.VMEM((3,) + plane, dtype) for _ in range(2 * T)]
            + [
                pltpu.VMEM((FR,) + plane, dtype),
                pltpu.VMEM((FR,) + plane, dtype),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            interpret=interpret,
        )

    T0 = sweeps_per_call

    def relax_raw(r, b, fr, fb, nsweeps: int, v_zero: bool = False):
        """Raw color-split IO; the red input is never read (red is
        fully replaced before first use in the red->black ordering).
        Small chunk counts are python-unrolled: this environment's
        remote compiler hangs on lax.fori_loop AROUND 513^3-scale
        pallas calls (unrolled chains of the same call compile in
        seconds), and the unrolled HLO is tiny (one custom-call per
        chunk)."""
        if v_zero:
            b = jnp.zeros((X,) + plane, dtype) if b is None else b
        n_full, rem = divmod(nsweeps, T0)
        if n_full:
            full = build(T0)
            if n_full <= 8:
                for _ in range(n_full):
                    r, b = full(b, fr, fb)
            else:
                r, b = lax.fori_loop(
                    0,
                    n_full,
                    lambda _, rb: full(rb[1], fr, fb),
                    (b, b),
                )
        if rem:
            r, b = build(rem)(b, fr, fb)
        return r, b

    relax_raw.supports_v_zero = True
    relax_raw.out_dtype = jnp.dtype(dtype)
    if raw:
        return relax_raw

    csplit, cmerge = make_color_converters(geom, dtype, interpret)

    def relax(v, f, nsweeps: int):
        _, b = csplit(v)
        fr, fb = csplit(f)
        r, b = relax_raw(None, b, fr, fb, nsweeps)
        return cmerge(r, b)

    return relax


def make_split_timeskew_relax_shard(
    problem,
    geom: LevelGeometry,
    dtype,
    sweeps_per_call: int,
    x_loc: int,
    interpret=False,
):
    """Per-shard time-skewed wavefront chunk for the sharded smoother
    (SCALING.md "time-skew as the per-shard engine"; parallel/halo.py).

    Identical schedule and per-point arithmetic to
    make_split_timeskew_relax, windowed onto one shard's extended slab:
    the kernel ingests black + RHS halves for XE = x_loc + 4T planes
    (the shard's x_loc owned planes plus 2T halo planes per side,
    supplied by the ppermute exchange where the single-chip kernel uses
    the wrap-zero plane) and emits exact red/black for the owned planes
    after T sweeps.  Since red is fully replaced before first use, ONLY
    the black halo needs exchanging — half the ICI volume of a dense
    halo.  The trapezoid argument gives exactness: edge corruption
    advances 2 planes per red+black sweep, so after T sweeps the wrong
    region reaches ext plane 2T-1 from below and XE-2T+1 from above —
    the owned window [2T, 2T + x_loc) is exact with one plane to spare.

    The global plane index enters as a scalar (SMEM) operand g0 =
    global index of ext plane 0: the x-validity gate (global plane 0 is
    the stored zero boundary; reads past the global top resolve to
    zero) is a per-plane scalar, and the checkerboard parity needs no
    offset because x_loc and 2T are even, so g0 is always even.

    HBM traffic per T-sweep chunk: read black+fr+fb ext, write r+b
    owned ~ 2.5 arrays -> ~10 B/point (vs the masked-block engine's
    ~3.5 arrays per SWEEP) — the single-chip time-skew economics,
    per shard."""
    assert geom.wrap and geom.ndim == 3
    XG, Y, Z = geom.padded_shape
    Y2 = Y // 2
    cdt = jnp.dtype(dtype)
    assert interpret or (Z % 128 == 0 and Y2 % 8 == 0)
    assert x_loc % 2 == 0  # keeps global parity == ext parity
    assert geom.shape[0] - 2 == XG - 1  # wrap: only plane 0 non-interior
    T = sweeps_per_call
    XE = x_loc + 4 * T
    plane = (Y2, Z)
    upd_fn = problem.split_update
    if os.environ.get("PDE_MG_TIMESKEW_FOLDED", "0") == "1":
        upd_fn = getattr(problem, "split_update_folded", upd_fn)

    def kernel(*refs):
        FR = 2 * T + 2
        (g0_ref, bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm) = refs[:6]
        b0s = refs[6]
        bss = refs[7 : 7 + T]
        rss = refs[7 + T : 7 + 2 * T]
        frs, fbs, in_sem, out_sem = refs[7 + 2 * T :]
        g0 = g0_ref[0]

        def in_dmas(x):
            return [
                pltpu.make_async_copy(
                    bv_hbm.at[pl.ds(x, 1)],
                    b0s.at[pl.ds(lax.rem(x, 4), 1)],
                    in_sem.at[0],
                ),
                pltpu.make_async_copy(
                    rf_hbm.at[pl.ds(x, 1)],
                    frs.at[pl.ds(lax.rem(x, FR), 1)],
                    in_sem.at[1],
                ),
                pltpu.make_async_copy(
                    bf_hbm.at[pl.ds(x, 1)],
                    fbs.at[pl.ds(lax.rem(x, FR), 1)],
                    in_sem.at[2],
                ),
            ]

        # pre-zero the v rings: ramp-time reads of not-yet-born planes
        # land on deterministic zeros (the single-chip slot-timing
        # argument carries over; those reads only feed the edge
        # trapezoids outside the owned window)
        zp = jnp.zeros((1,) + plane, dtype)
        for k in range(4):
            b0s[k : k + 1] = zp
        for ring in (*bss, *rss):
            for k in range(3):
                ring[k : k + 1] = zp

        jj = lax.broadcasted_iota(jnp.int32, (Y2, 1), 0)
        iz = lax.broadcasted_iota(jnp.int32, (1, Z), 1)
        okyz = (jj >= 1), (iz >= 1)
        zero_c = jnp.zeros((), cdt)

        for d in in_dmas(0):
            d.start()

        def read(ring, slot):
            a = ring[slot]
            return a.astype(cdt) if a.dtype != cdt else a

        def update(x, src_ring, rhs_ring, red, q1, ok):
            K = 4 if src_ring is b0s else 3
            g = g0 + x
            c0 = read(src_ring, lax.rem(x, K))
            cm = read(src_ring, lax.rem(x - 1, K))
            # +1 read gated at BOTH the global top (wrap zero) and the
            # window top (ring garbage; that plane's result is halo-
            # discarded anyway, the gate just keeps it finite)
            cp = read(src_ring, lax.rem(x + 1, K)) * (
                (g + 1 <= XG - 1) & (x + 1 <= XE - 1)
            ).astype(cdt)
            px = cm + cp
            if red:
                py = c0 + jnp.where(
                    q1, jnp.roll(c0, -1, 0), jnp.roll(c0, 1, 0)
                )
            else:
                py = c0 + jnp.where(
                    q1, jnp.roll(c0, 1, 0), jnp.roll(c0, -1, 0)
                )
            pz = jnp.roll(c0, 1, 1) + jnp.roll(c0, -1, 1)
            fh = read(rhs_ring, lax.rem(x, FR))
            upd = upd_fn((px, py, pz), fh, geom)
            # x-validity: global plane 0 is the stored zero boundary
            # (first shard's owned window includes it — it must emit 0)
            gv = ((g >= 1) & (g <= XG - 1)).astype(jnp.bool_)
            out = jnp.where(ok & gv, upd, zero_c)
            return out if cdt == jnp.dtype(dtype) else out.astype(dtype)

        def step(t, carry):
            @pl.when(t <= XE - 1)
            def _():
                for d in in_dmas(t):
                    d.wait()

            @pl.when(t + 1 <= XE - 1)
            def _():
                for d in in_dmas(t + 1):
                    d.start()

            # red planes of this step have ext parity (t+1), black
            # parity t; g0 is even so ext parity == global parity
            q1_r = ((t + 1 + iz) % 2) == 1
            q1_b = ((t + iz) % 2) == 1
            ok_r = (okyz[0] | q1_r) & okyz[1]
            ok_b = (okyz[0] | ~q1_b) & okyz[1]

            for s in range(1, T + 1):
                xr = t - (2 * s - 1)
                xb = t - 2 * s
                src_r = b0s if s == 1 else bss[s - 2]

                @pl.when((xr >= 1) & (xr <= XE - 1))
                def _(s=s, xr=xr, src_r=src_r):
                    if s == T:
                        @pl.when(xr - 3 >= 1)
                        def _():
                            pltpu.make_async_copy(
                                rss[T - 1].at[pl.ds(lax.rem(xr, 3), 1)],
                                ro_hbm.at[pl.ds(xr - 3, 1)],
                                out_sem.at[0, lax.rem(xr - 3, 3)],
                            ).wait()
                    rss[s - 1][lax.rem(xr, 3)] = update(
                        xr, src_r, frs, True, q1_r, ok_r
                    )
                    if s == T:
                        pltpu.make_async_copy(
                            rss[T - 1].at[pl.ds(lax.rem(xr, 3), 1)],
                            ro_hbm.at[pl.ds(xr, 1)],
                            out_sem.at[0, lax.rem(xr, 3)],
                        ).start()

                @pl.when((xb >= 1) & (xb <= XE - 1))
                def _(s=s, xb=xb):
                    if s == T:
                        @pl.when(xb - 3 >= 1)
                        def _():
                            pltpu.make_async_copy(
                                bss[T - 1].at[pl.ds(lax.rem(xb, 3), 1)],
                                bo_hbm.at[pl.ds(xb - 3, 1)],
                                out_sem.at[1, lax.rem(xb - 3, 3)],
                            ).wait()
                    bss[s - 1][lax.rem(xb, 3)] = update(
                        xb, rss[s - 1], fbs, False, q1_b, ok_b
                    )
                    if s == T:
                        pltpu.make_async_copy(
                            bss[T - 1].at[pl.ds(lax.rem(xb, 3), 1)],
                            bo_hbm.at[pl.ds(xb, 1)],
                            out_sem.at[1, lax.rem(xb, 3)],
                        ).start()

            return carry

        lax.fori_loop(0, XE + 2 * T, step, 0)

        # drain the last 3 planes' out-DMAs per color
        for dx in range(3):
            x = XE - 1 - dx
            if x < 1:
                continue
            pltpu.make_async_copy(
                rss[T - 1].at[pl.ds(x % 3, 1)],
                ro_hbm.at[pl.ds(x, 1)],
                out_sem.at[0, x % 3],
            ).wait()
            pltpu.make_async_copy(
                bss[T - 1].at[pl.ds(x % 3, 1)],
                bo_hbm.at[pl.ds(x, 1)],
                out_sem.at[1, x % 3],
            ).wait()
        # ext plane 0 is halo (discarded by the caller's owned slice)
        # but pallas outputs must not carry uninitialized memory into
        # donation-aliased buffers; write deterministic zeros
        zp_out = jnp.zeros((1,) + plane, dtype)
        b0s[0:1] = zp_out
        cp0 = [
            pltpu.make_async_copy(
                b0s.at[pl.ds(0, 1)], ro_hbm.at[pl.ds(0, 1)], in_sem.at[0]
            ),
            pltpu.make_async_copy(
                b0s.at[pl.ds(0, 1)], bo_hbm.at[pl.ds(0, 1)], in_sem.at[1]
            ),
        ]
        for c in cp0:
            c.start()
        for c in cp0:
            c.wait()

    FR = 2 * T + 2
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((XE,) + plane, dtype),
            jax.ShapeDtypeStruct((XE,) + plane, dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[pltpu.VMEM((4,) + plane, dtype)]
        + [pltpu.VMEM((3,) + plane, dtype) for _ in range(2 * T)]
        + [
            pltpu.VMEM((FR,) + plane, dtype),
            pltpu.VMEM((FR,) + plane, dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )

    def chunk(b_ext, fr_ext, fb_ext, g0):
        """(black, fr, fb) ext halves + traced global offset of ext
        plane 0 -> (red, black) ext halves, exact on the owned window
        [2T, 2T + x_loc)."""
        return call(jnp.asarray(g0, jnp.int32).reshape(1), b_ext,
                    fr_ext, fb_ext)

    chunk.T = T
    chunk.XE = XE
    return chunk


def make_split_timeskew_relax_jb(
    problem,
    geom: LevelGeometry,
    dtype,
    sweeps_per_call: int = 4,
    block_j: int = 64,
    interpret=False,
    raw: bool = False,
    compute_dtype=None,
):
    """j-blocked ("2.5D") time-skewed split-color RBGS (3D, wrap).

    make_split_timeskew_relax keeps whole (Y/2, Z) half-planes in its
    VMEM rings, which busts the budget once the plane reaches ~512 KB
    (513^3 and up).  Here the j (Y/2) axis is blocked like the
    trapezoidal kernels block it — each j-block runs the full x-axis
    time-skew wavefront over (Bj + 2*halo_j) column windows, with
    halo_j = round_up(2T, 8) columns of j-halo recomputed per side (the
    standard trapezoid argument: halo corruption advances <= 2 columns
    per red+black sweep, so owned columns stay exact for T sweeps).
    Each window carries ONE appended always-zero column: the sub-plane
    y-rolls wrap onto it at both real y boundaries (the clipping pins
    real boundaries to window edges), reproducing the full-plane
    kernel's wrap-to-zero reads exactly; interior window edges read
    >= halo_j columns of real halo data instead.

    Traffic/point/sweep = (6 * ext_j/Bj + 4) / T bytes — e.g. 2.9 B at
    (Bj=64, T=4) against the 2D-blocked trapezoid's ~23 B — with
    compute redundancy only ext_j/Bj (1.25 at Bj=64).
    """
    assert geom.wrap and geom.ndim == 3
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    cdt = jnp.dtype(compute_dtype or dtype)
    T = sweeps_per_call
    Bj = block_j
    halo_j = _round_up(2 * T, 8)
    ext_j = Bj + 2 * halo_j
    # appended always-zero j-wrap columns, padded to a full sublane
    # tile: a non-8-aligned sub-plane extent would make every y-roll a
    # relayout.  All padding columns stay zero (masked writes), so the
    # wrap reads land on zeros from either direction.
    loc_j = ext_j + 8
    assert interpret or Z % 128 == 0
    assert Bj % 8 == 0 and Y2 % Bj == 0 and Y2 >= ext_j
    assert X % 2 == 0
    assert geom.shape[0] - 2 == X - 1
    nblk_j = Y2 // Bj
    max_js = Y2 - ext_j
    plane = (loc_j, Z)
    upd_fn = problem.split_update

    def kernel(*refs, T):
        FR = 2 * T + 2
        (bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm) = refs[:5]
        b0s = refs[5]
        bss = refs[6 : 6 + T]
        rss = refs[6 + T : 6 + 2 * T]
        frs, fbs, in_sem, out_sem = refs[6 + 2 * T :]

        jl = lax.broadcasted_iota(jnp.int32, (loc_j, 1), 0)
        iz = lax.broadcasted_iota(jnp.int32, (1, Z), 1)
        okz = iz >= 1
        ok_app = jl < ext_j  # the appended zero column is never written
        zero_c = jnp.zeros((), cdt)
        zp = jnp.zeros((1,) + plane, dtype)

        for jb in range(nblk_j):
            js = min(max(jb * Bj - halo_j, 0), max_js)
            off = jb * Bj - js
            jj = js + jl  # global j of window columns

            def in_dmas(x, js=js):
                return [
                    pltpu.make_async_copy(
                        bv_hbm.at[pl.ds(x, 1), pl.ds(js, ext_j)],
                        b0s.at[pl.ds(lax.rem(x, 4), 1), pl.ds(0, ext_j)],
                        in_sem.at[0],
                    ),
                    pltpu.make_async_copy(
                        rf_hbm.at[pl.ds(x, 1), pl.ds(js, ext_j)],
                        frs.at[
                            pl.ds(lax.rem(x, FR), 1), pl.ds(0, ext_j)
                        ],
                        in_sem.at[1],
                    ),
                    pltpu.make_async_copy(
                        bf_hbm.at[pl.ds(x, 1), pl.ds(js, ext_j)],
                        fbs.at[
                            pl.ds(lax.rem(x, FR), 1), pl.ds(0, ext_j)
                        ],
                        in_sem.at[2],
                    ),
                ]

            def out_dma(ring, hbm, x, slot, color, jb=jb, off=off):
                return pltpu.make_async_copy(
                    ring.at[pl.ds(slot, 1), pl.ds(off, Bj)],
                    hbm.at[pl.ds(x, 1), pl.ds(jb * Bj, Bj)],
                    out_sem.at[color, lax.rem(x, 3)],
                )

            # pre-zero the v rings (ramp reads + the appended column)
            for k in range(4):
                b0s[k : k + 1] = zp
            for ring in (*bss, *rss):
                for k in range(3):
                    ring[k : k + 1] = zp

            for d in in_dmas(1):
                d.start()

            def read(ring, slot):
                a = ring[slot]
                return a.astype(cdt) if a.dtype != cdt else a

            def update(x, src_ring, rhs_ring, red, jj=jj):
                K = 4 if src_ring is b0s else 3
                c0 = read(src_ring, lax.rem(x, K))
                cm = read(src_ring, lax.rem(x - 1, K))
                cp = read(src_ring, lax.rem(x + 1, K)) * (
                    x + 1 <= X - 1
                ).astype(cdt)
                px = cm + cp
                q1 = ((x + iz) % 2) == 1
                if red:
                    py = c0 + jnp.where(
                        q1, jnp.roll(c0, -1, 0), jnp.roll(c0, 1, 0)
                    )
                else:
                    py = c0 + jnp.where(
                        q1, jnp.roll(c0, 1, 0), jnp.roll(c0, -1, 0)
                    )
                pz = jnp.roll(c0, 1, 1) + jnp.roll(c0, -1, 1)
                fh = read(rhs_ring, lax.rem(x, FR))
                upd = upd_fn((px, py, pz), fh, geom)
                ok = (
                    ((jj >= 1) | (q1 if red else ~q1))
                    & okz
                    & ok_app
                )
                out = jnp.where(ok, upd, zero_c)
                return (
                    out if cdt == jnp.dtype(dtype) else out.astype(dtype)
                )

            def step(t, carry):
                @pl.when(t <= X - 1)
                def _():
                    for d in in_dmas(t):
                        d.wait()

                @pl.when(t + 1 <= X - 1)
                def _():
                    for d in in_dmas(t + 1):
                        d.start()

                for s in range(1, T + 1):
                    xr = t - (2 * s - 1)
                    xb = t - 2 * s
                    src_r = b0s if s == 1 else bss[s - 2]

                    @pl.when((xr >= 1) & (xr <= X - 1))
                    def _(s=s, xr=xr, src_r=src_r):
                        if s == T:
                            @pl.when(xr - 3 >= 1)
                            def _():
                                out_dma(
                                    rss[T - 1], ro_hbm, xr - 3,
                                    lax.rem(xr - 3, 3), 0,
                                ).wait()
                        rss[s - 1][lax.rem(xr, 3)] = update(
                            xr, src_r, frs, True
                        )
                        if s == T:
                            out_dma(
                                rss[T - 1], ro_hbm, xr,
                                lax.rem(xr, 3), 0,
                            ).start()

                    @pl.when((xb >= 1) & (xb <= X - 1))
                    def _(s=s, xb=xb):
                        if s == T:
                            @pl.when(xb - 3 >= 1)
                            def _():
                                out_dma(
                                    bss[T - 1], bo_hbm, xb - 3,
                                    lax.rem(xb - 3, 3), 1,
                                ).wait()
                        bss[s - 1][lax.rem(xb, 3)] = update(
                            xb, rss[s - 1], fbs, False
                        )
                        if s == T:
                            out_dma(
                                bss[T - 1], bo_hbm, xb,
                                lax.rem(xb, 3), 1,
                            ).start()

                return carry

            lax.fori_loop(1, X + 2 * T, step, 0)

            for dx in range(3):
                x = X - 1 - dx
                if x < 1:
                    continue
                out_dma(rss[T - 1], ro_hbm, x, x % 3, 0).wait()
                out_dma(bss[T - 1], bo_hbm, x, x % 3, 1).wait()

            # plane 0 of both outputs: the zero boundary plane
            b0s[0:1] = zp
            cp0 = [
                pltpu.make_async_copy(
                    b0s.at[pl.ds(0, 1), pl.ds(0, Bj)],
                    ro_hbm.at[pl.ds(0, 1), pl.ds(jb * Bj, Bj)],
                    in_sem.at[0],
                ),
                pltpu.make_async_copy(
                    b0s.at[pl.ds(0, 1), pl.ds(0, Bj)],
                    bo_hbm.at[pl.ds(0, 1), pl.ds(jb * Bj, Bj)],
                    in_sem.at[1],
                ),
            ]
            for c in cp0:
                c.start()
            for c in cp0:
                c.wait()

    @functools.lru_cache(maxsize=None)
    def build(T: int):
        FR = 2 * T + 2
        return pl.pallas_call(
            functools.partial(kernel, T=T),
            out_shape=(
                jax.ShapeDtypeStruct((X, Y2, Z), dtype),
                jax.ShapeDtypeStruct((X, Y2, Z), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[pltpu.VMEM((4,) + plane, dtype)]
            + [pltpu.VMEM((3,) + plane, dtype) for _ in range(2 * T)]
            + [
                pltpu.VMEM((FR,) + plane, dtype),
                pltpu.VMEM((FR,) + plane, dtype),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            interpret=interpret,
        )

    T0 = sweeps_per_call

    def relax_raw(r, b, fr, fb, nsweeps: int, v_zero: bool = False):
        # small chunk counts python-unrolled (see the full-plane
        # kernel's relax_raw: fori around 513^3-scale pallas calls
        # hangs this environment's remote compiler)
        if v_zero:
            b = jnp.zeros((X, Y2, Z), dtype) if b is None else b
        n_full, rem = divmod(nsweeps, T0)
        if n_full:
            full = build(T0)
            if n_full <= 8:
                for _ in range(n_full):
                    r, b = full(b, fr, fb)
            else:
                r, b = lax.fori_loop(
                    0,
                    n_full,
                    lambda _, rb: full(rb[1], fr, fb),
                    (b, b),
                )
        if rem:
            r, b = build(rem)(b, fr, fb)
        return r, b

    relax_raw.supports_v_zero = True
    relax_raw.out_dtype = jnp.dtype(dtype)
    if raw:
        return relax_raw

    csplit, cmerge = make_color_converters(geom, dtype, interpret)

    def relax(v, f, nsweeps: int):
        _, b = csplit(v)
        fr, fb = csplit(f)
        r, b = relax_raw(None, b, fr, fb, nsweeps)
        return cmerge(r, b)

    return relax


# ------------------------------------------ 2D color-split slab kernel


def _qx_mask(X: int):
    """numpy bool (X, 1): q(x) = x % 2 — in 2D, red points of row x sit
    at y = 2j + q(x), black at y = 2j + 1 - q(x)."""
    return ((np.arange(X) % 2) == 1)[:, None]


def split_colors_2d(v, qx):
    """(X, Y) dense -> (R, B) color-split (X, Y/2) halves (lane-dim
    reshape + parity select; measured ~120 us per conversion at 2049^2 —
    amortized over the nu sweeps of a relax leg)."""
    X, Y = v.shape
    a2 = v.reshape(X, Y // 2, 2)
    v0, v1 = a2[:, :, 0], a2[:, :, 1]
    return jnp.where(qx, v1, v0), jnp.where(qx, v0, v1)


def merge_colors_2d(r, b, qx):
    """Inverse of split_colors_2d."""
    v0 = jnp.where(qx, b, r)
    v1 = jnp.where(qx, r, b)
    return jnp.stack([v0, v1], axis=2).reshape(r.shape[0], -1)


def _exact_pick_dot_rhs(a, p):
    """a @ p for a 0/1 single-entry-per-column pick matrix p (lane-dim
    contraction), bitwise-exact on the bf16 MXU via the three-term bf16
    decomposition of `a` (mirror of _exact_pick_dot)."""
    h1 = a.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = a - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    h3 = r1 - h2
    return (
        jnp.dot(h1, p, preferred_element_type=jnp.float32)
        + jnp.dot(h2, p, preferred_element_type=jnp.float32)
        + jnp.dot(h3, p, preferred_element_type=jnp.float32)
    )


def _conv_rows_2d(X: int, Y: int) -> int:
    row = (Y * 2) * 4  # in row + two half-rows out
    for B in (256, 128, 64, 32, 16, 8):
        if X % B == 0 and row * 7 * B <= SLAB_VMEM_BUDGET:
            return B
    return 8


@functools.lru_cache(maxsize=None)
def _pallas_split_2d(X: int, Y: int, Y2p: int, dtype, interpret=False):
    """split+pad(v (X,Y)) -> (r, b) (X, Y2p): the pallas tier of
    split_colors_2d + jnp.pad.  The XLA lane-dim reshape+parity-select
    lowers to a gather (measured 3.35 ms per conversion at 2049² — the
    entire 2D FMG fixed cost, 4 legs x split+merge ~ 26.6 ms/step);
    here each 128-lane output chunk is an MXU pick-dot of a 256-lane
    input chunk (the interleave pattern repeats every 256 lanes, so one
    (256,128) 0/1 matrix serves every chunk; bitwise-exact via the
    three-term bf16 data split)."""
    Y2 = Y // 2
    assert Y % 2 == 0 and Y2p % 128 == 0 and X % 8 == 0
    B = _conv_rows_2d(X, Y)
    # periodic picks: p0[yy, jj] = [yy == 2jj], p1[yy, jj] = [yy == 2jj+1]
    p0 = np.zeros((256, 128), np.float32)
    p1 = np.zeros((256, 128), np.float32)
    jj = np.arange(128)
    p0[2 * jj, jj] = 1.0
    p1[2 * jj + 1, jj] = 1.0
    p0 = jnp.asarray(p0)
    p1 = jnp.asarray(p1)
    nJ = Y2p // 128

    def kernel(v_ref, p0_ref, p1_ref, r_ref, b_ref):
        x0 = pl.program_id(0) * B
        gx = x0 + lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        q1 = (gx % 2) == 1
        v = v_ref[:]
        for J in range(nJ):
            lo = 256 * J
            w = min(256, Y - lo)
            if w <= 0:
                z = jnp.zeros((B, 128), dtype)
                r_ref[:, 128 * J : 128 * (J + 1)] = z
                b_ref[:, 128 * J : 128 * (J + 1)] = z
                continue
            a = v[:, lo : lo + w]
            s0 = _exact_pick_dot_rhs(a, p0_ref[:w])
            s1 = _exact_pick_dot_rhs(a, p1_ref[:w])
            r_ref[:, 128 * J : 128 * (J + 1)] = jnp.where(q1, s1, s0)
            b_ref[:, 128 * J : 128 * (J + 1)] = jnp.where(q1, s0, s1)

    return pl.pallas_call(
        kernel,
        grid=(X // B,),
        in_specs=[
            pl.BlockSpec((B, Y), lambda i: (i, 0)),
            pl.BlockSpec((256, 128), lambda i: (0, 0)),
            pl.BlockSpec((256, 128), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((B, Y2p), lambda i: (i, 0)),
            pl.BlockSpec((B, Y2p), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, Y2p), dtype),
            jax.ShapeDtypeStruct((X, Y2p), dtype),
        ),
        interpret=interpret,
    ), p0, p1


@functools.lru_cache(maxsize=None)
def _pallas_merge_2d(X: int, Y: int, Y2p: int, dtype, interpret=False):
    """merge(r, b (X,Y2p)) -> v (X,Y): inverse of _pallas_split_2d
    (transposed picks; pad lanes never picked)."""
    Y2 = Y // 2
    assert Y % 2 == 0 and Y2p % 128 == 0 and X % 8 == 0
    B = _conv_rows_2d(X, Y)
    u0 = np.zeros((128, 256), np.float32)
    u1 = np.zeros((128, 256), np.float32)
    jj = np.arange(128)
    u0[jj, 2 * jj] = 1.0
    u1[jj, 2 * jj + 1] = 1.0
    u0 = jnp.asarray(u0)
    u1 = jnp.asarray(u1)
    nJ = Y2p // 128

    def kernel(r_ref, b_ref, u0_ref, u1_ref, v_ref):
        x0 = pl.program_id(0) * B
        gx = x0 + lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        q1 = (gx % 2) == 1
        r, b = r_ref[:], b_ref[:]
        for J in range(nJ):
            lo = 256 * J
            w = min(256, Y - lo)
            if w <= 0:
                continue
            rj = r[:, 128 * J : 128 * (J + 1)]
            bj = b[:, 128 * J : 128 * (J + 1)]
            v0 = jnp.where(q1, bj, rj)  # even-y values
            v1 = jnp.where(q1, rj, bj)  # odd-y values
            v_ref[:, lo : lo + w] = (
                _exact_pick_dot_rhs(v0, u0_ref[:, :w])
                + _exact_pick_dot_rhs(v1, u1_ref[:, :w])
            )

    return pl.pallas_call(
        kernel,
        grid=(X // B,),
        in_specs=[
            pl.BlockSpec((B, Y2p), lambda i: (i, 0)),
            pl.BlockSpec((B, Y2p), lambda i: (i, 0)),
            pl.BlockSpec((128, 256), lambda i: (0, 0)),
            pl.BlockSpec((128, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, Y), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y), dtype),
        interpret=interpret,
    ), u0, u1


# Default OFF: ISOLATED XLA conversions measure 3.35 ms each at 2049²
# (lane-gather lowering), but inside the full FMG program XLA fuses
# the gathers into the surrounding consumers and the real cost mostly
# vanishes — the opaque pallas converters then BREAK those fusions and
# LOSE end-to-end (interleaved two-nu A/B, scripts/ab_split2d_conv.py,
# 2026-08-20: step fixed 12.2 vs 10.2 ms, slope parity, identical
# residuals).  Kept for layouts where the fusion can't happen.
SPLIT2D_CONV_KERNEL = (
    os.environ.get("PDE_MG_SPLIT2D_CONV_KERNEL", "0") == "1"
)


def make_color_converters_2d(X, Y, Y2p, dtype, interpret=False):
    """(split_pad, merge) pair for one padded 2D level: pallas MXU
    pick-dot tier when aligned, XLA reshape+select fallback otherwise.
    split_pad(v) -> (r, b) lane-padded to Y2p; merge(r, b) -> v."""
    Y2 = Y // 2
    qx = _qx_mask(X)
    if (
        SPLIT2D_CONV_KERNEL
        and Y % 2 == 0
        and Y2p % 128 == 0
        and X % 8 == 0
    ):
        sc, p0, p1 = _pallas_split_2d(X, Y, Y2p, dtype, interpret)
        mc, u0, u1 = _pallas_merge_2d(X, Y, Y2p, dtype, interpret)
        return (
            lambda v: sc(v, p0, p1),
            lambda r, b: mc(r, b, u0, u1),
        )

    def split_pad(v):
        r, b = split_colors_2d(v, qx)
        pad = ((0, 0), (0, Y2p - Y2))
        return jnp.pad(r, pad), jnp.pad(b, pad)

    return split_pad, (
        lambda r, b: merge_colors_2d(r[:, :Y2], b[:, :Y2], qx)
    )


def make_split_color_slab_2d(
    problem,
    geom: LevelGeometry,
    dtype,
    slab_rows: int,
    sweeps_per_call: int = 1,
    interpret=False,
    raw: bool = False,
):
    """Color-split slab relaxation for 2D PADDED levels.

    The dense 2D slab kernel computes every point's update and discards
    the other color's half — 2x redundant arithmetic (and for the
    one-sided Lyapunov stencil the update itself is only ~6 ops, so the
    waste dominates).  Red/black live as (X, Y/2) halves split along the
    LANE dim with q = x % 2 (red y = 2j + q):

      * x+-1 neighbors of red sit at the SAME j in black (q flips with
        x), so the x gathers are plain sublane rolls with no select;
      * y+-1 neighbors need one parity select per gather:
        red y+1 = B[x, j+q], red y-1 = B[x, j+q-1] (black mirrors with
        q -> 1-q).

    Neighbor access is handed to `problem.split_update2d(nbr, f, pre,
    geom)` via an `nbr(axis, off)` callback, and per-color coefficient
    fields reuse `problem.kernel_precompute` evaluated at the color's
    own (x, y) coordinates.  x uses the same sublane-aligned trapezoidal
    slab scheme as make_slab_relax; each red+black sweep consumes 2 halo
    rows per x-DEPENDENT side, and the per-side halo is
    round_up(2T, 8) only on sides the stencil actually reads
    (`problem.split2d_x_offsets`, default symmetric) — for one-sided
    stencils (Lyapunov reads only x+1) the bottom halo is dropped
    entirely, cutting the redundant-compute overhead in half.  Non-wrap
    (padded) storage only: lane/sublane rolls wrap onto discarded halo
    margins or masked padding.
    """
    assert geom.ndim == 2 and not geom.wrap
    X, Y = geom.padded_shape
    Y2 = Y // 2
    # HBM<->VMEM DMA slices need a 128-aligned lane extent; the halves
    # are lane-padded with inert zeros (masks exclude them: their y
    # indices exceed ny-2 by construction)
    Y2p = _round_up(Y2, 128)
    B = slab_rows
    T = sweeps_per_call
    x_offs = tuple(
        getattr(problem, "split2d_x_offsets", None) or (-1, +1)
    )  # None = plan-level veto only; direct makers use the default
    # OFF by default: hardware A/B (2049^2 L0 leg, interleaved) measured
    # jnp.where ~15-25% SLOWER than the f32 mask blend on the v5e VPU
    # (28.6-32.4 vs 36.3-36.6 us/sweep, bitwise-identical results)
    use_sel = os.environ.get("PDE_MG_RBGS_SELECT", "0") == "1"
    # mask-fold: write m*upd + c with c = (1-m)*v0 hoisted once per block
    # (masked points never change across a leg, so (1-m)*v is leg-
    # invariant).  Drops the old-value read and one VPU op per color per
    # sweep vs the blend; numerics == the select form (m*upd + 0 = upd
    # bitwise at interior points).  VMEM-resident body probe
    # (scripts/probe_split2d_body.py): 3.0 -> 3.6e11 updates/s.
    use_fold = (
        os.environ.get("PDE_MG_SPLIT2D_FOLD", "1") == "1" and not use_sel
    )
    halo = _round_up(2 * T, 8)
    halo_lo = halo if -1 in x_offs else 0
    halo_hi = halo if +1 in x_offs else 0
    ext = B + halo_lo + halo_hi
    assert B % 8 == 0 and X % 8 == 0 and X >= ext
    nblk = X // B
    rem_start = nblk * B
    assert rem_start >= geom.shape[0] - 1
    max_start = X - ext
    ny = geom.shape[0 + 1]

    def kernel(*refs, nsweeps_here, with_f):
        # with_f=False drops the RHS streams entirely (finest-level legs
        # of problems with rhs_is_zero: Lyapunov's f == 0): 4 -> 2 HBM
        # in-streams and one fewer multiply-add per point per sweep.
        if with_f:
            (rv_hbm, bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm,
             rvb, bvb, rfb, bfb, in_sem, out_sem) = refs
            bufs = (rvb, bvb, rfb, bfb)
            hbms = (rv_hbm, bv_hbm, rf_hbm, bf_hbm)
        else:
            (rv_hbm, bv_hbm, ro_hbm, bo_hbm,
             rvb, bvb, in_sem, out_sem) = refs
            bufs = (rvb, bvb)
            hbms = (rv_hbm, bv_hbm)

        def start_units(p):
            return jnp.clip(
                p * (B // 8) - halo_lo // 8, 0, max_start // 8
            )

        def start_of(p):
            return start_units(p) * 8

        def in_dmas(slot, p):
            s = start_of(p)
            return [
                pltpu.make_async_copy(
                    h.at[pl.ds(s, ext)],
                    b.at[slot],
                    in_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(zip(hbms, bufs))
            ]

        def out_dmas(slot, p):
            off = (p * (B // 8) - start_units(p)) * 8
            return [
                pltpu.make_async_copy(
                    b.at[slot, pl.ds(off, B)],
                    h.at[pl.ds(p * B, B)],
                    out_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(((ro_hbm, rvb), (bo_hbm, bvb)))
            ]

        for d in in_dmas(0, 0):
            d.start()

        jj = lax.broadcasted_iota(jnp.int32, (1, Y2p), 1)

        def rl(a, s):
            return jnp.roll(a, -s, axis=1)

        def nbr_factory(other, q1):
            def nbr(ax, off):
                if ax == 0:
                    return jnp.roll(other, -off, axis=0)
                if off == +1:
                    return jnp.where(q1, rl(other, 1), other)
                return jnp.where(q1, other, rl(other, -1))

            return nbr

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            @pl.when(p + 1 < nblk)
            def _():
                @pl.when(p >= 1)
                def _():
                    for d in out_dmas(nxt, p - 1):
                        d.wait()

                for d in in_dmas(nxt, p + 1):
                    d.start()

            for d in in_dmas(slot, p):
                d.wait()
            s = start_of(p)
            g = s + lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
            q1 = (g % 2) == 1
            qi = q1.astype(jnp.int32)
            y_r = 2 * jj + qi
            y_b = 2 * jj + 1 - qi
            okx = (g >= 1) & (g <= geom.shape[0] - 2)
            m_r = (y_r >= 1) & (y_r <= ny - 2) & okx
            m_b = (y_b >= 1) & (y_b <= ny - 2) & okx
            if not use_sel:
                m_r, m_b = m_r.astype(dtype), m_b.astype(dtype)
            one = jnp.asarray(1, dtype)
            # per-color coefficient fields at the color's own coords
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
                    + yi.astype(dtype)
                    * jnp.asarray(geom.spacing[1], dtype),
                    min(lo1, hi1),
                    max(lo1, hi1),
                )

            pre_r = problem.kernel_precompute(
                (xf, yf(y_r)), geom, dtype
            )
            pre_b = problem.kernel_precompute(
                (xf, yf(y_b)), geom, dtype
            )
            # keep-mask hook (HJB's pinned target ball): extra
            # never-update points beyond the geometric boundary,
            # evaluated per color at the color's own coordinates
            # (round 4 — previously keep-mask problems were excluded
            # from the split tiers entirely)
            keep_fn = getattr(problem, "kernel_keep_mask", None)
            if keep_fn is not None:
                k_r = keep_fn((xf, yf(y_r)), geom, dtype)
                k_b = keep_fn((xf, yf(y_b)), geom, dtype)
                if use_sel:
                    m_r = m_r & (k_r > 0)
                    m_b = m_b & (k_b > 0)
                else:
                    m_r = m_r * k_r
                    m_b = m_b * k_b
            r, b = rvb[slot], bvb[slot]
            fr, fb = (rfb[slot], bfb[slot]) if with_f else (None, None)
            if use_fold:
                c_r = (one - m_r) * r  # bitwise r at masked points
                c_b = (one - m_b) * b

            def one_sweep(_, rb):
                r, b = rb
                upd = problem.split_update2d(
                    nbr_factory(b, q1), fr, pre_r, geom
                )
                # select, not blend: bitwise the reference's in-place
                # write at masked-on points and 2 fewer VPU ops
                if use_fold:
                    r = m_r * upd + c_r
                elif use_sel:
                    r = jnp.where(m_r, upd, r)
                else:
                    r = r + m_r * (upd - r)
                upd = problem.split_update2d(
                    nbr_factory(r, jnp.logical_not(q1)), fb, pre_b, geom
                )
                if use_fold:
                    b = m_b * upd + c_b
                elif use_sel:
                    b = jnp.where(m_b, upd, b)
                else:
                    b = b + m_b * (upd - b)
                return r, b

            if nsweeps_here == 1:
                r, b = one_sweep(0, (r, b))
            else:
                r, b = lax.fori_loop(0, nsweeps_here, one_sweep, (r, b))
            rvb[slot] = r
            bvb[slot] = b
            for d in out_dmas(slot, p):
                d.start()
            return 0

        lax.fori_loop(0, nblk, body, 0)
        for d in out_dmas((nblk - 1) % 2, nblk - 1):
            d.wait()
        if nblk > 1:
            for d in out_dmas((nblk - 2) % 2, nblk - 2):
                d.wait()

    @functools.lru_cache(maxsize=None)
    def build(nsweeps_here: int, with_f: bool = True):
        nin = 4 if with_f else 2
        call = pl.pallas_call(
            functools.partial(
                kernel, nsweeps_here=nsweeps_here, with_f=with_f
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rem_start, Y2p), dtype),
                jax.ShapeDtypeStruct((rem_start, Y2p), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nin,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ext, Y2p), dtype) for _ in range(nin)
            ] + [
                pltpu.SemaphoreType.DMA((2, nin)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )
        if rem_start == X:
            return call

        def with_tail(r, b, *fs):
            ro, bo = call(r, b, *fs)
            return (
                jnp.concatenate([ro, r[rem_start:]], axis=0),
                jnp.concatenate([bo, b[rem_start:]], axis=0),
            )

        return with_tail

    def run_halves(r, b, fs, nsweeps: int):
        n_full, rem = divmod(nsweeps, T)
        if n_full:
            full = build(T, bool(fs))
            if n_full == 1:
                r, b = full(r, b, *fs)
            else:
                r, b = lax.fori_loop(
                    0,
                    n_full,
                    lambda _, rb: full(rb[0], rb[1], *fs),
                    (r, b),
                )
        if rem:
            r, b = build(rem, bool(fs))(r, b, *fs)
        return r, b

    supports_fz = bool(
        getattr(problem, "split_update2d_f_optional", False)
    )
    if raw:
        # persistent-split tier (round 5): halves in, halves out — the
        # caller owns the dense<->split conversions and caches them
        # across relax legs / cycle visits (ops/split2d.py)
        def relax_raw(r, b, fs, nsweeps: int):
            return run_halves(r, b, tuple(fs), nsweeps)

        relax_raw.supports_f_zero = supports_fz
        relax_raw.kind = "split2d_raw"
        return relax_raw

    conv_split, conv_merge = make_color_converters_2d(
        X, Y, Y2p, dtype, interpret
    )

    def relax(v, f, nsweeps: int, f_zero: bool = False):
        r, b = conv_split(v)
        fs = () if f_zero else conv_split(f)
        r, b = run_halves(r, b, fs, nsweeps)
        return conv_merge(r, b)

    # the f_zero fast path calls problem.split_update2d(nbr, None, ...):
    # only offered when the problem declares it handles a None RHS
    relax.supports_f_zero = supports_fz
    return relax


def make_split_color_slab_2d_shard(
    problem,
    geom: LevelGeometry,
    dtype,
    sweeps_per_call: int,
    halo_sweeps: int,
    x_loc: int,
    interpret=False,
):
    """Per-shard color-split slab chunk for the sharded 2D smoother
    (parallel/halo.py; VERDICT r3 #2 — the 2D counterpart of
    make_split_timeskew_relax_shard).

    Identical per-point arithmetic and block schedule to
    make_split_color_slab_2d, windowed onto one shard's extended slab:
    the kernel ingests red/black (+ RHS) halves for the shard's x_loc
    owned rows plus round_up(2*halo_sweeps, 8) halo rows per x-side the
    stencil reads (supplied by the ppermute exchange where the
    single-chip kernel reads neighboring rows of the same array) and
    emits exact owned rows after `sweeps_per_call` <= halo_sweeps
    sweeps.  The trapezoid argument gives exactness: stale-edge
    corruption advances 2 rows per red+black sweep, so valid halos of
    2*t rows keep the owned window exact for t sweeps; at domain ends
    the ring-wrapped halo rows are garbage, but the global boundary /
    padding rows there are masked off and never update, which blocks
    the corruption front before it reaches an owned interior row.

    The global row of ext row 0 enters as an SMEM scalar g0 (always
    even: x_loc % 8 == 0 and the halos are 8-aligned, so checkerboard
    parity and coordinate fields use g = g0 + row with no per-shard
    recompile).  One-sided stencils (Lyapunov: split2d_x_offsets ==
    (+1,)) drop the bottom halo entirely — half the ICI volume and
    half the redundant halo compute.

    HBM traffic per t-sweep chunk: read r+b (+fr+fb) ext, write owned
    r+b ~ (2..4)*(ext/B) + 2 arrays per CHUNK — the single-chip split-
    slab economics (~1.1 B/point/sweep at T=8) vs the masked-block
    fallback engine's ~3.5 arrays per SWEEP."""
    assert geom.ndim == 2 and not geom.wrap
    X, Y = geom.padded_shape
    Y2 = Y // 2
    Y2p = _round_up(Y2, 128)
    T = halo_sweeps
    t_here = sweeps_per_call
    assert 1 <= t_here <= T
    x_offs = tuple(
        getattr(problem, "split2d_x_offsets", None) or (-1, +1)
    )  # None = plan-level veto only; direct makers use the default
    use_sel = os.environ.get("PDE_MG_RBGS_SELECT", "0") == "1"
    use_fold = (
        os.environ.get("PDE_MG_SPLIT2D_FOLD", "1") == "1" and not use_sel
    )
    halo = _round_up(2 * T, 8)
    halo_lo = halo if -1 in x_offs else 0
    halo_hi = halo if +1 in x_offs else 0
    XE = x_loc + halo_lo + halo_hi
    assert x_loc % 8 == 0  # sublane-aligned DMA offsets + even parity
    # block rows: largest divisor of x_loc whose window fits the shared
    # single-chip ladder (VMEM cost model + compile-service window cap)
    plan2d = split2d_plan((X, Y), x_offs, t=T, x_divides=x_loc)
    assert plan2d is not None, (x_loc, Y2p)
    B = plan2d[0]
    ext = B + halo_lo + halo_hi
    nblk = x_loc // B
    ny = geom.shape[1]
    nx = geom.shape[0]

    def kernel(*refs, with_f):
        if with_f:
            (g0_ref, rv_hbm, bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm,
             rvb, bvb, rfb, bfb, in_sem, out_sem) = refs
            bufs = (rvb, bvb, rfb, bfb)
            hbms = (rv_hbm, bv_hbm, rf_hbm, bf_hbm)
        else:
            (g0_ref, rv_hbm, bv_hbm, ro_hbm, bo_hbm,
             rvb, bvb, in_sem, out_sem) = refs
            bufs = (rvb, bvb)
            hbms = (rv_hbm, bv_hbm)
        g0 = g0_ref[0]

        def in_dmas(slot, p):
            # ext slab carries exactly the halos each window wants:
            # block p's window is [p*B, p*B + ext) — no clipping
            return [
                pltpu.make_async_copy(
                    h.at[pl.ds(p * B, ext)],
                    b.at[slot],
                    in_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(zip(hbms, bufs))
            ]

        def out_dmas(slot, p):
            return [
                pltpu.make_async_copy(
                    b.at[slot, pl.ds(halo_lo, B)],
                    h.at[pl.ds(p * B, B)],
                    out_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(((ro_hbm, rvb), (bo_hbm, bvb)))
            ]

        for d in in_dmas(0, 0):
            d.start()

        jj = lax.broadcasted_iota(jnp.int32, (1, Y2p), 1)

        def rl(a, s):
            return jnp.roll(a, -s, axis=1)

        def nbr_factory(other, q1):
            def nbr(ax, off):
                if ax == 0:
                    return jnp.roll(other, -off, axis=0)
                if off == +1:
                    return jnp.where(q1, rl(other, 1), other)
                return jnp.where(q1, other, rl(other, -1))

            return nbr

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            @pl.when(p + 1 < nblk)
            def _():
                @pl.when(p >= 1)
                def _():
                    for d in out_dmas(nxt, p - 1):
                        d.wait()

                for d in in_dmas(nxt, p + 1):
                    d.start()

            for d in in_dmas(slot, p):
                d.wait()
            g = (
                g0
                + p * B
                + lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
            )
            q1 = (g % 2) == 1
            qi = q1.astype(jnp.int32)
            y_r = 2 * jj + qi
            y_b = 2 * jj + 1 - qi
            okx = (g >= 1) & (g <= nx - 2)
            m_r = (y_r >= 1) & (y_r <= ny - 2) & okx
            m_b = (y_b >= 1) & (y_b <= ny - 2) & okx
            if not use_sel:
                m_r, m_b = m_r.astype(dtype), m_b.astype(dtype)
            one = jnp.asarray(1, dtype)
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
                    + yi.astype(dtype)
                    * jnp.asarray(geom.spacing[1], dtype),
                    min(lo1, hi1),
                    max(lo1, hi1),
                )

            pre_r = problem.kernel_precompute((xf, yf(y_r)), geom, dtype)
            pre_b = problem.kernel_precompute((xf, yf(y_b)), geom, dtype)
            r, b = rvb[slot], bvb[slot]
            fr, fb = (rfb[slot], bfb[slot]) if with_f else (None, None)
            if use_fold:
                c_r = (one - m_r) * r
                c_b = (one - m_b) * b

            def one_sweep(_, rb):
                r, b = rb
                upd = problem.split_update2d(
                    nbr_factory(b, q1), fr, pre_r, geom
                )
                if use_fold:
                    r = m_r * upd + c_r
                elif use_sel:
                    r = jnp.where(m_r, upd, r)
                else:
                    r = r + m_r * (upd - r)
                upd = problem.split_update2d(
                    nbr_factory(r, jnp.logical_not(q1)), fb, pre_b, geom
                )
                if use_fold:
                    b = m_b * upd + c_b
                elif use_sel:
                    b = jnp.where(m_b, upd, b)
                else:
                    b = b + m_b * (upd - b)
                return r, b

            if t_here == 1:
                r, b = one_sweep(0, (r, b))
            else:
                r, b = lax.fori_loop(0, t_here, one_sweep, (r, b))
            rvb[slot] = r
            bvb[slot] = b
            for d in out_dmas(slot, p):
                d.start()
            return 0

        lax.fori_loop(0, nblk, body, 0)
        for d in out_dmas((nblk - 1) % 2, nblk - 1):
            d.wait()
        if nblk > 1:
            for d in out_dmas((nblk - 2) % 2, nblk - 2):
                d.wait()

    @functools.lru_cache(maxsize=None)
    def build(with_f: bool = True):
        nin = 4 if with_f else 2
        return pl.pallas_call(
            functools.partial(kernel, with_f=with_f),
            out_shape=(
                jax.ShapeDtypeStruct((x_loc, Y2p), dtype),
                jax.ShapeDtypeStruct((x_loc, Y2p), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * nin,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ext, Y2p), dtype) for _ in range(nin)
            ]
            + [
                pltpu.SemaphoreType.DMA((2, nin)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )

    def chunk(r_ext, b_ext, fr_ext, fb_ext, g0):
        """(red, black[, fr, fb]) ext halves + traced global row of ext
        row 0 -> (red, black) OWNED halves, exact after t sweeps."""
        g0 = jnp.asarray(g0, jnp.int32).reshape(1)
        if fr_ext is None:
            return build(False)(g0, r_ext, b_ext)
        return build(True)(g0, r_ext, b_ext, fr_ext, fb_ext)

    chunk.halo_lo = halo_lo
    chunk.halo_hi = halo_hi
    chunk.XE = XE
    return chunk


# --------------------------------------- 2D reduced-system slab kernel


def make_split_reduced_slab_2d(
    problem,
    geom: LevelGeometry,
    dtype,
    slab_rows: int,
    sweeps_per_call: int = 1,
    interpret=False,
):
    """Reduced-system (black-only) relaxation for one-sided 2D stencils.

    For a one-sided stencil (reads only +x/+y, e.g. Lyapunov), RBGS is a
    bipartite iteration: red's update reads only black, black's reads
    only (freshly updated) red.  Substituting red's update into black's
    collapses ONE FULL RBGS SWEEP (both colors) into a single 3-term
    black-to-black update

        b <- Cxx * B[x+2, j] + Cxy * B[x+1, j+1-q] + Cyy * B[x, j+1]
             + Cf

    with all C fields sweep-invariant (built once per chunk from the
    problem's `kernel_precompute` coefficients at the black point, its
    red-east neighbor (x+1, y), and its red-south neighbor (x, y+1) —
    red interior masks folded in, masked-red Dirichlet contributions and
    the RHS terms folded into Cf).  Red is reconstructed ONCE per chunk
    from the second-to-last black state: after T sweeps RBGS leaves
    (r_T, b_T) with r_T = R(b_{T-1}), which is exactly what the
    `b_prev` copy reproduces — the chunk output matches T reference
    RBGS sweeps (up to FP reassociation in the precomputed products).

    vs make_split_color_slab_2d per sweep: ~12 VPU ops per point-PAIR
    instead of ~16, and ONE array (B) read+written instead of both
    colors — the lever for the leg's measured VMEM-access bound.
    Same trapezoidal x-blocking, same one-sided 2T-row halo (the
    reduced stencil consumes 2 rows/sweep, exactly like a red+black
    pair).  Eligibility: `problem.reduced2d_fields = (east, south, f)`
    naming its `kernel_precompute` output fields, and
    `split2d_x_offsets == (+1,)`.
    """
    assert geom.ndim == 2 and not geom.wrap
    assert tuple(getattr(problem, "split2d_x_offsets", ())) == (+1,)
    ke, ks, kf = problem.reduced2d_fields
    X, Y = geom.padded_shape
    Y2 = Y // 2
    Y2p = _round_up(Y2, 128)
    B = slab_rows
    T = sweeps_per_call
    halo = _round_up(2 * T, 8)
    ext = B + halo  # one-sided: high-x halo only
    assert B % 8 == 0 and X % 8 == 0 and X >= ext
    nblk = X // B
    rem_start = nblk * B
    assert rem_start >= geom.shape[0] - 1
    max_start = X - ext
    nx = geom.shape[0]
    ny = geom.shape[1]

    def kernel(*refs, nsweeps_here, with_f):
        if with_f:
            (rv_hbm, bv_hbm, rf_hbm, bf_hbm, ro_hbm, bo_hbm,
             rvb, bvb, rfb, bfb, in_sem, out_sem) = refs
            bufs = (rvb, bvb, rfb, bfb)
            hbms = (rv_hbm, bv_hbm, rf_hbm, bf_hbm)
        else:
            (rv_hbm, bv_hbm, ro_hbm, bo_hbm,
             rvb, bvb, in_sem, out_sem) = refs
            bufs = (rvb, bvb)
            hbms = (rv_hbm, bv_hbm)

        def start_units(p):
            return jnp.clip(p * (B // 8), 0, max_start // 8)

        def start_of(p):
            return start_units(p) * 8

        def in_dmas(slot, p):
            s = start_of(p)
            return [
                pltpu.make_async_copy(
                    h.at[pl.ds(s, ext)],
                    b.at[slot],
                    in_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(zip(hbms, bufs))
            ]

        def out_dmas(slot, p):
            off = (p * (B // 8) - start_units(p)) * 8
            return [
                pltpu.make_async_copy(
                    b.at[slot, pl.ds(off, B)],
                    h.at[pl.ds(p * B, B)],
                    out_sem.at[slot, k],
                )
                for k, (h, b) in enumerate(((ro_hbm, rvb), (bo_hbm, bvb)))
            ]

        for d in in_dmas(0, 0):
            d.start()

        jj = lax.broadcasted_iota(jnp.int32, (1, Y2p), 1)

        def rl(a, s):
            return jnp.roll(a, -s, axis=1)

        def body(p, _):
            slot = p % 2
            nxt = (p + 1) % 2

            @pl.when(p + 1 < nblk)
            def _():
                @pl.when(p >= 1)
                def _():
                    for d in out_dmas(nxt, p - 1):
                        d.wait()

                for d in in_dmas(nxt, p + 1):
                    d.start()

            for d in in_dmas(slot, p):
                d.wait()
            s = start_of(p)
            g = s + lax.broadcasted_iota(jnp.int32, (ext, 1), 0)
            q1 = (g % 2) == 1
            qi = q1.astype(jnp.int32)
            y_r = 2 * jj + qi
            y_b = 2 * jj + 1 - qi
            one = jnp.asarray(1, dtype)
            okx = (g >= 1) & (g <= nx - 2)
            oky_b = (y_b >= 1) & (y_b <= ny - 2)
            m_b = (okx & oky_b).astype(dtype)
            m_r = (okx & (y_r >= 1) & (y_r <= ny - 2)).astype(dtype)
            # red-neighbor interior masks (east: x+1 same y; south: y+1)
            m_rE = (
                (g + 1 >= 1) & (g + 1 <= nx - 2) & oky_b
            ).astype(dtype)
            m_rS = (
                okx & (y_b + 1 >= 1) & (y_b + 1 <= ny - 2)
            ).astype(dtype)
            lo0, hi0 = geom.domain[0]
            lo1, hi1 = geom.domain[1]

            def xf(gi):
                return jnp.clip(
                    jnp.asarray(geom.origin[0], dtype)
                    + gi.astype(dtype)
                    * jnp.asarray(geom.spacing[0], dtype),
                    min(lo0, hi0),
                    max(lo0, hi0),
                )

            def yf(yi):
                return jnp.clip(
                    jnp.asarray(geom.origin[1], dtype)
                    + yi.astype(dtype)
                    * jnp.asarray(geom.spacing[1], dtype),
                    min(lo1, hi1),
                    max(lo1, hi1),
                )

            pre_b = problem.kernel_precompute(
                (xf(g), yf(y_b)), geom, dtype
            )
            pre_rE = problem.kernel_precompute(
                (xf(g + 1), yf(y_b)), geom, dtype
            )
            pre_rS = problem.kernel_precompute(
                (xf(g), yf(y_b + 1)), geom, dtype
            )
            pre_r = problem.kernel_precompute(
                (xf(g), yf(y_r)), geom, dtype
            )
            ae_b, as_b = pre_b[ke], pre_b[ks]
            # reduced coefficients (red masks folded in)
            c_xx = ae_b * m_rE * pre_rE[ke]
            c_xy = ae_b * m_rE * pre_rE[ks] + as_b * m_rS * pre_rS[ke]
            c_yy = as_b * m_rS * pre_rS[ks]
            r_in, b0 = rvb[slot], bvb[slot]
            # masked-red (Dirichlet ring) contributions; gathers of the
            # leg-invariant red input: R[x+1, j] and R[x, j+1-q]
            rE_in = jnp.roll(r_in, -1, axis=0)
            rS_in = jnp.where(q1, r_in, rl(r_in, 1))
            c_f = ae_b * (one - m_rE) * rE_in + as_b * (
                one - m_rS
            ) * rS_in
            if with_f:
                fr, fb = rfb[slot], bfb[slot]
                frE = jnp.roll(fr, -1, axis=0)
                frS = jnp.where(q1, fr, rl(fr, 1))
                c_f = c_f + (
                    ae_b * m_rE * pre_rE[kf] * frE
                    + as_b * m_rS * pre_rS[kf] * frS
                    + pre_b[kf] * fb
                )
            c_bk = (one - m_b) * b0  # fold: masked black never changes
            c_rk = (one - m_r) * r_in

            def one_sweep(_, b):
                bE2 = jnp.roll(b, -2, axis=0)
                b1 = jnp.roll(b, -1, axis=0)
                bXY = jnp.where(q1, b1, rl(b1, 1))
                bYY = rl(b, 1)
                upd = c_xx * bE2 + c_xy * bXY + c_yy * bYY + c_f
                return m_b * upd + c_bk

            # loop carries ONLY b (a (b, b_prev) carry costs a full
            # extra VMEM copy per sweep — measured 24% slower); the
            # final sweep is peeled so b_prev falls out for free
            if nsweeps_here == 1:
                b_prev = b0
            else:
                b_prev = lax.fori_loop(
                    0, nsweeps_here - 1, one_sweep, b0
                )
            b = one_sweep(0, b_prev)
            # red reconstruction from the SECOND-TO-LAST black state:
            # r_T = R(b_{T-1}) — exactly the reference RBGS final red
            rE = jnp.roll(b_prev, -1, axis=0)
            rS = jnp.where(q1, rl(b_prev, 1), b_prev)
            r_upd = pre_r[ke] * rE + pre_r[ks] * rS
            if with_f:
                r_upd = r_upd + pre_r[kf] * rfb[slot]
            rvb[slot] = m_r * r_upd + c_rk
            bvb[slot] = b
            for d in out_dmas(slot, p):
                d.start()
            return 0

        lax.fori_loop(0, nblk, body, 0)
        for d in out_dmas((nblk - 1) % 2, nblk - 1):
            d.wait()
        if nblk > 1:
            for d in out_dmas((nblk - 2) % 2, nblk - 2):
                d.wait()

    @functools.lru_cache(maxsize=None)
    def build(nsweeps_here: int, with_f: bool = True):
        nin = 4 if with_f else 2
        call = pl.pallas_call(
            functools.partial(
                kernel, nsweeps_here=nsweeps_here, with_f=with_f
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rem_start, Y2p), dtype),
                jax.ShapeDtypeStruct((rem_start, Y2p), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nin,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ext, Y2p), dtype) for _ in range(nin)
            ] + [
                pltpu.SemaphoreType.DMA((2, nin)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )
        if rem_start == X:
            return call

        def with_tail(r, b, *fs):
            ro, bo = call(r, b, *fs)
            return (
                jnp.concatenate([ro, r[rem_start:]], axis=0),
                jnp.concatenate([bo, b[rem_start:]], axis=0),
            )

        return with_tail

    conv_split, conv_merge = make_color_converters_2d(
        X, Y, Y2p, dtype, interpret
    )

    def relax(v, f, nsweeps: int, f_zero: bool = False):
        r, b = conv_split(v)
        fs = () if f_zero else conv_split(f)
        n_full, rem = divmod(nsweeps, T)
        if n_full:
            full = build(T, not f_zero)
            if n_full == 1:
                r, b = full(r, b, *fs)
            else:
                r, b = lax.fori_loop(
                    0,
                    n_full,
                    lambda _, rb: full(rb[0], rb[1], *fs),
                    (r, b),
                )
        if rem:
            r, b = build(rem, not f_zero)(r, b, *fs)
        return conv_merge(r, b)

    relax.supports_f_zero = bool(
        getattr(problem, "split_update2d_f_optional", False)
    )
    return relax


# ------------------------------------- 2D-blocked split-color slab kernel


def make_split_slab_relax_2d(
    problem,
    geom: LevelGeometry,
    dtype,
    slab_rows: int,
    block_j: int,
    sweeps_per_call: int = 1,
    interpret=False,
    raw: bool = False,
    compute_dtype=None,
):
    """Split-color slab relaxation blocked along BOTH x and y (3D, wrap).

    make_split_slab_relax keeps whole (Y/2, Z) half-planes in VMEM, which
    busts the scoped-VMEM limit once the plane reaches ~256 KB (257^3 and
    up — the reference's CUDA headline size, CUDA Poisson 3D/main.cu:18).
    Here each DMA round trip moves an (ext_x, ext_j, Z) sub-block: x uses
    the same trapezoidal scheme (2T-row halo, traced fori_loop walk), y
    adds a second blocked axis with an 8-row halo — 8 because Mosaic DMA
    offsets on the sublane dim must be 8-aligned, which also covers the
    2T rows trapezoidal correctness needs for T <= 4.  The y-block walk
    is a static Python loop (few blocks; per-block masks are recomputed,
    cheap at once per column), the x walk stays double-buffered.

    Wrap correctness: both blocked axes append one always-zero local row;
    in-buffer rolls wrap onto it, reproducing the stored-zero-plane reads
    of the full-array kernel at the true upper boundaries.  At interior
    block edges the wrapped reads land in the discarded halo-corruption
    region.
    """
    assert geom.wrap and geom.ndim == 3
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    Bx = slab_rows
    Bj = block_j
    T = sweeps_per_call
    cdt = jnp.dtype(compute_dtype or dtype)
    # sublane (j) DMA offsets must be tile-aligned: 8 rows for f32,
    # 16 for bf16 storage — which also sets the j halo (>= 2T rows of
    # trapezoidal correctness margin)
    sub = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    assert 1 <= T <= sub // 2, "j-halo covers at most sub/2 sweeps"
    halo_x = 2 * T
    HJ = sub
    ext_x = Bx + 2 * halo_x
    assert Bx % 2 == 0 and X % 2 == 0 and X >= ext_x and X % Bx == 0
    assert Bj % sub == 0 and Y2 % Bj == 0 and Y2 >= Bj + 2 * HJ
    ext_j = Bj + 2 * HJ
    loc_x = ext_x + 1  # + appended always-zero x-wrap row
    loc_j = ext_j + 1  # + appended always-zero j-wrap row
    nblk_x = X // Bx
    nblk_j = Y2 // Bj
    max_sx = X - ext_x
    assert max_sx % 2 == 0  # even starts: checkerboard parity invariant
    # per-array x read radii: (r, b, fr, fb) — see in_dmas
    HX = (2 * T - 1, 2 * T, 2 * T - 1, 2 * T - 2)
    HJ_FB = 0 if T == 1 else HJ

    def kernel(
        rv_hbm,
        bv_hbm,
        rf_hbm,
        bf_hbm,
        ro_hbm,
        bo_hbm,
        rvb,
        bvb,
        rfb,
        bfb,
        mr_ref,
        mb_ref,
        in_sem,
        out_sem,
        *,
        nsweeps_here,
    ):
        bufs = (rvb, bvb, rfb, bfb)
        hbms = (rv_hbm, bv_hbm, rf_hbm, bf_hbm)
        lshape = (loc_x, loc_j, Z)

        def start_of(p):
            return jnp.clip(p * Bx - halo_x, 0, max_sx)

        # Zero-init everything once: (a) the appended wrap rows (DMAs
        # never overwrite them), (b) rows outside the asymmetric DMA
        # windows, which uninitialized VMEM could fill with NaN — masked
        # blends do NOT discard NaN (0 * NaN = NaN), so every uncovered
        # row must start finite.  Owned outputs never *depend* on these
        # rows (verified: zeroing them reproduces the dense-kernel result
        # bit-for-bit), they only pass through discarded lanes.
        for b in bufs:
            for slot in (0, 1):
                b[slot] = jnp.zeros((loc_x, loc_j, Z), dtype)

        ix = lax.broadcasted_iota(jnp.int32, (loc_x, 1, Z), 0)
        iz = lax.broadcasted_iota(jnp.int32, (loc_x, 1, Z), 2)
        q1 = ((ix + iz) % 2) == 1
        jj = lax.broadcasted_iota(jnp.int32, (1, loc_j, 1), 1)
        ok_z = iz >= 1

        def roll(a, ax, off):
            return jnp.roll(a, -off, axis=ax)

        for qj in range(nblk_j):
            sj = min(max(qj * Bj - HJ, 0), Y2 - ext_j)  # static, 8-aligned
            oj = qj * Bj - sj  # static owned-row offset in the buffer
            jglob = jj + sj
            # (jj < ext_j) keeps the appended zero row truly zero through
            # the sweeps: the top block's edge rows read it via the j-wrap
            # as the y = Y boundary plane (non-top blocks' edge reads land
            # in discarded halo either way)
            ok_j = jj < ext_j
            mr_ref[:] = jnp.broadcast_to(
                ((jglob >= 1) | q1) & ok_j & ok_z, lshape
            ).astype(cdt)
            mb_ref[:] = jnp.broadcast_to(
                ((jglob >= 1) | ~q1) & ok_j & ok_z, lshape
            ).astype(cdt)

            def in_dmas(slot, p):
                # Asymmetric per-array read halos (backward induction over
                # the red-then-black sweep order): per T-sweep round trip
                # the owned rows only need  b at +-2T,  r and fr at
                # +-(2T-1),  fb at +-(2T-2)  x-rows, and fb needs no
                # j-halo at T=1 — a ~20% read cut vs loading the full
                # (ext_x, ext_j) window for all four arrays.  Each window
                # is placed in the same local frame as the black array's
                # (the widest, = start_of); nesting holds at the clamped
                # edge blocks too, where reads past x = X-1 come from the
                # appended zero wrap row instead of HBM.  Uncovered buffer
                # rows hold stale finite data that only feeds discarded
                # (non-owned) outputs.
                s = start_of(p)
                cps = []
                for k, (h, b) in enumerate(zip(hbms, bufs)):
                    hx = HX[k]
                    size = Bx + 2 * hx
                    sk = jnp.clip(p * Bx - hx, 0, X - size)
                    if k == 3 and HJ_FB == 0:
                        js, jd, jsz = qj * Bj, oj, Bj
                    else:
                        js, jd, jsz = sj, 0, ext_j
                    cps.append(
                        pltpu.make_async_copy(
                            h.at[pl.ds(sk, size), pl.ds(js, jsz)],
                            b.at[slot, pl.ds(sk - s, size), pl.ds(jd, jsz)],
                            in_sem.at[slot, k],
                        )
                    )
                return cps

            def out_dmas(slot, p):
                s = start_of(p)
                return [
                    pltpu.make_async_copy(
                        b.at[slot, pl.ds(p * Bx - s, Bx), pl.ds(oj, Bj)],
                        h.at[pl.ds(p * Bx, Bx), pl.ds(qj * Bj, Bj)],
                        out_sem.at[slot, k],
                    )
                    for k, (h, b) in enumerate(
                        ((ro_hbm, rvb), (bo_hbm, bvb))
                    )
                ]

            for d in in_dmas(0, 0):
                d.start()

            def body(p, _):
                slot = p % 2
                nxt = (p + 1) % 2

                @pl.when(p + 1 < nblk_x)
                def _():
                    @pl.when(p >= 1)
                    def _():
                        for d in out_dmas(nxt, p - 1):
                            d.wait()

                    for d in in_dmas(nxt, p + 1):
                        d.start()

                for d in in_dmas(slot, p):
                    d.wait()
                s = start_of(p)
                g = s + lax.broadcasted_iota(jnp.int32, (loc_x, 1, 1), 0)
                rv_x = ((g >= 1) & (g <= geom.shape[0] - 2)).astype(cdt)
                m_r = mr_ref[:] * rv_x
                m_b = mb_ref[:] * rv_x
                r, b = rvb[slot].astype(cdt), bvb[slot].astype(cdt)
                fr, fb = rfb[slot].astype(cdt), bfb[slot].astype(cdt)

                def one_sweep(_, rb):
                    r, b = rb
                    pairs = (
                        roll(b, 0, -1) + roll(b, 0, +1),
                        b + jnp.where(q1, roll(b, 1, +1), roll(b, 1, -1)),
                        roll(b, 2, -1) + roll(b, 2, +1),
                    )
                    upd = problem.split_update(pairs, fr, geom)
                    r = r + m_r * (upd - r)
                    pairs = (
                        roll(r, 0, -1) + roll(r, 0, +1),
                        r + jnp.where(q1, roll(r, 1, -1), roll(r, 1, +1)),
                        roll(r, 2, -1) + roll(r, 2, +1),
                    )
                    upd = problem.split_update(pairs, fb, geom)
                    b = b + m_b * (upd - b)
                    return r, b

                if nsweeps_here == 1:
                    r, b = one_sweep(0, (r, b))
                else:
                    r, b = lax.fori_loop(0, nsweeps_here, one_sweep, (r, b))
                rvb[slot, :ext_x, :ext_j] = r[:ext_x, :ext_j].astype(dtype)
                bvb[slot, :ext_x, :ext_j] = b[:ext_x, :ext_j].astype(dtype)
                for d in out_dmas(slot, p):
                    d.start()
                return 0

            lax.fori_loop(0, nblk_x, body, 0)
            for d in out_dmas((nblk_x - 1) % 2, nblk_x - 1):
                d.wait()
            if nblk_x > 1:
                for d in out_dmas((nblk_x - 2) % 2, nblk_x - 2):
                    d.wait()

    tail = (Y2, Z)

    @functools.lru_cache(maxsize=None)
    def build(nsweeps_here: int):
        return pl.pallas_call(
            functools.partial(kernel, nsweeps_here=nsweeps_here),
            out_shape=(
                jax.ShapeDtypeStruct((X,) + tail, dtype),
                jax.ShapeDtypeStruct((X,) + tail, dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, loc_x, loc_j, Z), dtype),
                pltpu.VMEM((2, loc_x, loc_j, Z), dtype),
                pltpu.VMEM((2, loc_x, loc_j, Z), dtype),
                pltpu.VMEM((2, loc_x, loc_j, Z), dtype),
                pltpu.VMEM((loc_x, loc_j, Z), cdt),
                pltpu.VMEM((loc_x, loc_j, Z), cdt),
                pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
        )

    def relax_raw(r, b, fr, fb, nsweeps: int):
        n_full, rem = divmod(nsweeps, T)
        if n_full:
            full = build(T)
            if n_full == 1:
                r, b = full(r, b, fr, fb)
            else:
                r, b = lax.fori_loop(
                    0,
                    n_full,
                    lambda _, rb: full(rb[0], rb[1], fr, fb),
                    (r, b),
                )
        if rem:
            r, b = build(rem)(r, b, fr, fb)
        return r, b

    if raw:
        return relax_raw

    csplit, cmerge = make_color_converters(geom, dtype, interpret)

    def relax(v, f, nsweeps: int):
        r, b = csplit(v)
        fr, fb = csplit(f)
        r, b = relax_raw(r, b, fr, fb, nsweeps)
        return cmerge(r, b)

    return relax


# ------------------------------------------------------------------ planning

RESIDENT_VMEM_BUDGET = 9 * 2**20  # conservative: leave room for temps
SLAB_VMEM_BUDGET = 12 * 2**20  # against the 16MB scoped-vmem hard limit
# time-skew rings: (10T + 8) half-planes + ~8 planes of sweep temps;
# T=8 at 257^3 = ~12.6 MB (T=10 compiled at ~15 MB but is gated off)
TIMESKEW_VMEM_BUDGET = 14 * 2**20
# split-kernel sweeps per HBM round trip.  Measured on TPU v5e (129^3):
# T=2 is marginally SLOWER end-to-end (27.3 vs 26.5 ms/step) and doubles
# Mosaic compile time — the DMA prefetch already hides most traffic.
SPLIT_SWEEPS_PER_CALL = 1
# ... but the 2D split slab (2049^2 Lyapunov) is different: its one-sided
# halo is nearly free (round_up(2T, 8) rows on ONE side), so more sweeps
# per round trip amortize both HBM traffic AND the per-block coefficient
# precompute.  Hardware A/B (scripts/ab_split2d_t.py, 2049^2, two
# interleaved rounds): T=8 beat T=4 on every paired run — 33.3/35.3 vs
# 38.7/37.0 ms/step at nu=100, 18.6/18.8 vs 21.8/25.5 ms at nu=40.
# Env-tunable for re-measurement on other hardware.  Round 2: with
# B=128 now available, T=16 beats T=8 (25.7-25.9 vs 28.8-29.2 us/sweep,
# two interleaved rounds at 2049^2 nu=96); T=24 is slightly worse.
SPLIT2D_T = int(os.environ.get("PDE_MG_SPLIT2D_T", "16"))
# smallest half-width (Y/2) level the 2D color-split kernel engages at:
# below this the per-leg XLA split/merge conversions historically beat
# the halved arithmetic; f_zero halves the conversion cost on root legs.
# Hardware A/B (scripts/ab_split2d_min_y2.py, 2049^2 nu=100, T=8, two
# interleaved rounds): 256 beat 512 on every paired run (31.0/31.2 vs
# 32.4/32.8 ms/step) — 513^2-class levels now ride the split kernel.
SPLIT2D_MIN_Y2 = int(os.environ.get("PDE_MG_SPLIT2D_MIN_Y2", "256"))
# reduced-system (black-only) kernel for one-sided 2D stencils
# (make_split_reduced_slab_2d): one full RBGS sweep as a single 3-term
# black update.  Default OFF until hardware-A/B'd vs the color slab
# (scripts/ab_split2d_reduced.py).
SPLIT2D_REDUCED = (
    os.environ.get("PDE_MG_SPLIT2D_REDUCED", "0") == "1"
)
# Largest (ext-rows x lane-padded-half-width) VMEM window the 2D
# color-split kernels can compile.  This is a REAL scoped-VMEM
# boundary, not compile-service flakiness: on 2026-08-21 the service
# surfaced the true error behind the 2026-08-20 HTTP-500s — "Scoped
# allocation with size 16.06M and limit 16.00M exceeded" for the
# 720K window, i.e. the kernel's compiled VMEM stack is ~22.8 bytes
# per window byte (double-buffered copies of the ~12 modeled streams),
# so the feasible boundary is 16M/22.8 = ~713K.  Empirical: PASS
# (128,T8)@2049^2=627K (14.3M scoped), (64,T8)@4097^2=696,320B
# (15.5M); FAIL (128,T16)@2049^2=720K (16.06M), (64,T16)@4097^2=835K,
# (96,T8)@4097^2=975K.  Raising the env knob past ~712 can never
# compile (scripts/ab_split2d_window.py reproduces the OOM); a bigger
# window requires actually shrinking the kernel's per-stream
# buffering, not lifting the cap.
SPLIT2D_MAX_WINDOW = (
    int(os.environ.get("PDE_MG_SPLIT2D_MAX_WINDOW_KB", "680")) * 1024
)


def split2d_plan(
    padded_shape, x_offsets=(-1, +1), t=None, x_cover=0, x_divides=0
):
    """Shared (B, T, ext) ladder for the 2D color-split slab kernels —
    the ONE place the block-rows/sweeps-per-chunk selection lives, so
    plan_relax, the sharded engine gate (parallel/halo.py), and the
    roofline traffic model (utils/roofline.py) cannot desynchronize.
    x_cover: the blocks must cover at least this many leading rows
    (single-chip: interior extent — remainder rows carry no interior
    points).  x_divides: B must divide this extent exactly (sharded:
    the per-shard owned rows).  Returns None when no block satisfies
    the VMEM cost model and the compile-service window cap."""
    X, Y = padded_shape
    half_row = _round_up(Y // 2, 128) * 4
    n_sides = len(set(x_offsets))
    ts = (t,) if t is not None else tuple(
        dict.fromkeys((SPLIT2D_T, 8, 4))
    )
    best = None
    for B in (128, 64, 32, 16, 8):
        for T2 in ts:
            ext = B + n_sides * _round_up(2 * T2, 8)
            if X < ext:
                continue
            if x_cover and (X // B) * B < x_cover:
                continue
            if x_divides and x_divides % B:
                continue
            if (
                half_row * 12 * ext > SLAB_VMEM_BUDGET
                or half_row * ext > SPLIT2D_MAX_WINDOW
            ):
                continue
            # cost = VPU halo redundancy + weighted HBM round trips.
            # Calibrated against three interleaved hardware A/Bs
            # (scripts/ab_split2d_t.py): 2049^2 uncapped (128,16) beat
            # (128,8) by 11% => weight > 1.0; 4097^2 under today's
            # window cap (64,8) beat (32,16) by 12% => weight < 8.0;
            # 2049^2 capped (128,8) ~= (64,16) (192.9/194.8 us/nu tie).
            # weight=2 picks the measured winner in all three.
            r = ext / B
            cost = r + 2.0 * (r + 1.0) / T2
            if best is None or cost < best[0]:
                best = (cost, B, T2, ext)
    if best is None:
        return None
    return best[1], best[2], best[3]


# j-blocked time-skew ring-set budget: 10T+8 sub-planes
# (hardware-validated incl. (T=4, Bj=128) at 513^3: pipelined
# 1.25 ms/sweep, 20% over (4, 64))
TIMESKEW_JB_VMEM_BUDGET = 15 * 2**20


def timeskew_plan(shape):
    """Shared 3D-wrap time-skew engagement gates + (T, Bj) ladder —
    called by plan_relax AND utils/roofline.py's traffic model so the
    two cannot desynchronize (ADVICE r3).  Problem-dependent gates
    (wrap, split_update, keep-mask) stay at the callers.

    Returns ("full", T, 1.0) for the whole-half-plane wavefront,
    ("jb", T, Bj, halo_factor) for the j-blocked 2.5D variant (whole
    half-planes bust the rings at 513^3 and up: round_up(2T, 8)-column
    halos per side), or None.  The 16384-point half-plane threshold:
    at 129^3 (8K) the trapezoid slab measured FASTER (19-21 vs 31-33
    us/sweep); at 257^3 (32K) the timeskew wins 2.5x."""
    Y2 = shape[1] // 2
    if not (
        os.environ.get("PDE_MG_TIMESKEW", "1") == "1"
        and len(shape) == 3
        and shape[1] % 2 == 0
        and shape[2] % 128 == 0
        and Y2 % 8 == 0
        and shape[0] >= 8
        and Y2 * shape[2] >= 16384
    ):
        return None
    P = Y2 * shape[2] * 4
    t_cap = int(os.environ.get("PDE_MG_TIMESKEW_T", "8"))
    for T in (t_cap, 6, 4, 2):
        if T > t_cap or shape[0] < 2 * T:
            continue
        if (10 * T + 16) * P <= TIMESKEW_VMEM_BUDGET:
            return ("full", T, 1.0)
    for T in (4, 2):
        if T > t_cap or shape[0] < 2 * T:
            continue
        hj = _round_up(2 * T, 8)
        for Bj in (128, 64, 32):
            if Y2 % Bj or Y2 < Bj + 2 * hj:
                continue
            Pj = tile_padded_bytes((Bj + 2 * hj + 8, shape[2]))
            if (10 * T + 8) * Pj <= TIMESKEW_JB_VMEM_BUDGET:
                return ("jb", T, Bj, (Bj + 2 * hj) / Bj)
    return None


def plan_relax(problem, geom: LevelGeometry, dtype, interpret=False):
    """Pick resident vs slab kernel for one level; None if unsupported."""
    from pde_multigrid_tpu.models.base import ProblemBase

    # a problem participates iff it overrides kernel_update
    if type(problem).kernel_update is ProblemBase.kernel_update:
        return None
    # problems with a keep-mask hook (extra never-update points, e.g.
    # HJB's pinned ball) are served ONLY by the dense tiers that honor it
    # (_coords_and_masks / make_slab_relax); the color-split and merged
    # tiers build their masks inline and would update pinned points
    has_keep = hasattr(problem, "kernel_keep_mask")
    shape = geom.padded_shape
    # merged-layout resident kernel: wrap-mode 3D with sub-lane Z — views
    # the array as (X, Y*Z/128, 128), zero tile waste, whole level in VMEM
    if (
        not has_keep
        and geom.wrap
        and len(shape) == 3
        and shape[2] < 128
        and (shape[1] * shape[2]) % 128 == 0
        and hasattr(problem, "merged_update")
    ):
        merged_bytes = shape[0] * shape[1] * shape[2] * 4
        if merged_bytes * 7 <= RESIDENT_VMEM_BUDGET:
            # Dense (non-split) kernel on purpose: the split variant
            # (make_split_merged_relax) halves the in-VMEM arithmetic but
            # pays 3 XLA strided-gather color conversions per relax call
            # (sub-lane Z has no pallas converter tier), and FMG calls
            # relax at level l in 2*(l+1) V-cycles per step — hundreds of
            # tiny XLA gather ops whose fixed cost dwarfs the resident
            # kernel's arithmetic.  Measured end-to-end (129^3 FMG,
            # nu=100): dense-merged subtree beats split-merged.
            return make_merged_resident_relax(
                problem, geom, dtype, interpret
            )
    arr_bytes = tile_padded_bytes(shape)
    n_pre = len(
        problem.kernel_precompute(
            tuple(
                jnp.zeros((1,) * max(len(shape), 2), dtype)
                for _ in range(len(shape))
            ),
            geom,
            dtype,
        )
    )
    # resident footprint: v, f, out, masks(2), pre, ~2 temps
    resident_cost = arr_bytes * (5 + n_pre + 2)
    if resident_cost <= RESIDENT_VMEM_BUDGET:
        if (
            len(shape) == 1
            and not has_keep
            and not geom.wrap
            and shape[0] % 2 == 0
            and hasattr(problem, "split_update1d")
        ):
            # color-split halves: ~half the dense kernel's arithmetic
            # (the 1D local solve is 2 FMAs; computing both colors
            # everywhere and discarding half dominates)
            return make_split_resident_relax_1d(
                problem, geom, dtype, interpret
            )
        return make_resident_relax(problem, geom, dtype, interpret)
    if len(shape) == 1:
        return None  # 1D never exceeds the budget in practice
    # time-skewed wavefront (3D wrap, constant-coefficient): zero
    # redundant arithmetic at ~10 B/point per T sweeps — measured 2.5x
    # over the 2D-blocked trapezoid at 257^3 (128-140 vs 345-349
    # us/sweep, numerically identical).  Preferred for every slab-tier
    # wrap level whose ring set fits VMEM.  Engagement gates + the
    # (T, Bj) ladder live in timeskew_plan — shared with the roofline
    # traffic model (utils/roofline.py) so they cannot desynchronize.
    if (
        not has_keep
        and geom.wrap
        and len(shape) == 3
        and hasattr(problem, "split_update")
    ):
        ts = timeskew_plan(shape)
        if ts is not None and ts[0] == "full":
            return make_split_timeskew_relax(
                problem, geom, dtype, ts[1], interpret=interpret
            )
        if ts is not None and ts[0] == "jb":
            return make_split_timeskew_relax_jb(
                problem, geom, dtype, ts[1], ts[2],
                interpret=interpret,
            )
    # color-split slab (3D wrap, constant-coefficient): ~half the
    # arithmetic of the dense masked slab.  Cost model: 8 double-buffered
    # half-plane slabs + 2 masks + ~4 roll temps, each ~loc rows.
    if (
        not has_keep
        and geom.wrap
        and len(shape) == 3
        and hasattr(problem, "split_update")
        and shape[1] % 2 == 0
        and shape[2] % 128 == 0
        and (shape[1] // 2) % 8 == 0
    ):
        half_plane = (shape[1] // 2) * shape[2] * 4
        for B in (16, 8, 4):
            ext = B + 4 * SPLIT_SWEEPS_PER_CALL
            if shape[0] < ext or shape[0] % B:
                continue
            if half_plane * 14 * (ext + 1) <= SLAB_VMEM_BUDGET:
                return make_split_slab_relax(
                    problem,
                    geom,
                    dtype,
                    B,
                    sweeps_per_call=SPLIT_SWEEPS_PER_CALL,
                    interpret=interpret,
                )
    # 2D-blocked split slab: when whole half-planes no longer fit (257^3
    # and up), block y as well.  Cost model mirrors the full-plane one:
    # 8 double-buffered sub-blocks + 2 masks + ~4 roll temps, each
    # ~(loc_x, loc_j, Z).  Prefer larger Bx (x halo amortization), then
    # larger Bj (j halo is a fixed 8 rows per side).
    if (
        not has_keep
        and geom.wrap
        and len(shape) == 3
        and hasattr(problem, "split_update")
        and shape[1] % 16 == 0
        and shape[2] % 128 == 0
    ):
        Y2 = shape[1] // 2
        for B in (8, 4):
            ext = B + 4 * SPLIT_SWEEPS_PER_CALL
            if shape[0] % B or shape[0] < ext or (shape[0] - ext) % 2:
                continue
            for Bj in (64, 32, 16, 8):
                if Y2 % Bj or Y2 < Bj + 16:
                    continue
                unit = tile_padded_bytes((ext + 1, Bj + 17, shape[2]))
                if unit * 14 <= SLAB_VMEM_BUDGET:
                    return make_split_slab_relax_2d(
                        problem,
                        geom,
                        dtype,
                        B,
                        Bj,
                        sweeps_per_call=SPLIT_SWEEPS_PER_CALL,
                        interpret=interpret,
                    )
    # the slab kernel DMAs HBM slices along axis 0, which requires the
    # trailing dims to sit on tile boundaries (sublane 8 / lane 128);
    # wrap-mode 2^k extents satisfy this automatically once big enough.
    # For 2D, axis 0 is itself the sublane dim: extents, slab rows, and
    # halos must all be 8-aligned (see make_slab_relax).
    # 2D color-split slab (padded storage): ~half the arithmetic of the
    # dense masked update — and for one-sided stencils (Lyapunov) the
    # dense update is so cheap that the discarded half DOMINATES.
    # Keep-mask problems (HJB's pinned ball) are allowed since round 4:
    # the kernel applies kernel_keep_mask per color in-kernel.  A
    # problem can veto per instance with split2d_x_offsets = None
    # (HJB's documented-divergent "tesi" scheme).
    if (
        len(shape) == 2
        and not geom.wrap
        and hasattr(problem, "split_update2d")
        and hasattr(problem, "kernel_precompute")
        and getattr(problem, "split2d_x_offsets", (-1, 1)) is not None
        and shape[1] % 2 == 0
        and shape[0] % 8 == 0
        # big levels only: the per-leg XLA split/merge conversions
        # (~0.36 ms) outweigh the halved arithmetic on smaller slabs
        and shape[1] // 2 >= SPLIT2D_MIN_Y2
    ):
        # B=128 hardware-A/B'd at 2049^2: 26.8 vs 29.5 us/sweep over B=64
        # (halo-redundant compute 1.125x vs 1.25x); B=256 busts scoped
        # VMEM (measured 16.71M > 16M) and the cost model rejects it.
        # The ladder (incl. the compile-service window cap) lives in
        # split2d_plan — shared with the sharded gate and roofline model.
        reduced = (
            SPLIT2D_REDUCED
            and hasattr(problem, "reduced2d_fields")
            and tuple(getattr(problem, "split2d_x_offsets", ())) == (1,)
        )
        plan2d = split2d_plan(
            shape,
            getattr(problem, "split2d_x_offsets", (-1, 1)),
            x_cover=geom.shape[0] - 1,
        )
        if plan2d is not None:
            B, T2, _ = plan2d
            maker = (
                make_split_reduced_slab_2d
                if reduced
                else make_split_color_slab_2d
            )
            return maker(
                problem, geom, dtype, B,
                sweeps_per_call=T2, interpret=interpret,
            )
    if any(d % 8 for d in shape[1:-1]) or shape[-1] % 128:
        return None
    align = 8 if len(shape) == 2 else 1
    if shape[0] % align:
        return None
    # per-ROW VMEM bytes: for 2D, axis 0 IS the sublane dim, so a row is
    # just the lane extent — tile-padding a single row would overcount
    # 8x and (regression) reject the slab kernel at 2049^2 entirely,
    # silently dropping the finest 2D level to the jnp tier
    if len(shape) == 2:
        plane = _round_up(shape[1], 128) * 4
    else:
        plane = tile_padded_bytes((1,) + tuple(shape[1:]))
    # Measured on TPU v5e (129^3 Poisson, align=1): T=1 is the sweet
    # spot — the halo grows with 2T rows, so T>1 only adds redundant
    # compute.  For 2D (align=8) the sublane-aligned halo is 8 rows for
    # ANY T <= 4, so T=4 quarters the HBM traffic per sweep at the same
    # window — prefer it, with larger B to amortize the halo.  VMEM cost
    # model (against v5e's 16MB scoped limit): double-buffered vbuf +
    # fbuf (4 slabs) + two masks + ~2 roll temps, each ~loc_rows rows.
    zrow = align if geom.wrap else 0
    for T in (4, 1) if align == 8 else (1,):
        for B in (64, 32, 16, 8) if align == 8 else (16, 8, 4):
            ext = B + 2 * (-((2 * T) // -align) * align)
            ext += (shape[0] - ext) % 2
            if shape[0] < ext:
                continue
            if (shape[0] // B) * B < geom.shape[0] - 1:
                continue  # remainder rows would contain interior points
            if plane * 8 * (ext + zrow) <= SLAB_VMEM_BUDGET:
                return make_slab_relax(
                    problem, geom, dtype, B, T, interpret
                )
    return None


def plan_split2d_raw(problem, geom: LevelGeometry, dtype, interpret=False):
    """(relax_raw, split_pad, merge) for levels where plan_relax picks
    the 2D color-split slab, else None — the persistent-split tier
    (round 5): relax_raw(r, b, fs, nsweeps) consumes/produces halves;
    split_pad/merge are the level's converters.  Mirrors plan_relax's
    2D branch exactly (same gates, same split2d_plan ladder) so the two
    cannot pick different kernels; the reduced-system kernel has no raw
    form, so SPLIT2D_REDUCED opts a problem out of persistence."""
    shape = geom.padded_shape
    if not (
        len(shape) == 2
        and not geom.wrap
        and hasattr(problem, "split_update2d")
        and hasattr(problem, "kernel_precompute")
        and getattr(problem, "split2d_x_offsets", (-1, 1)) is not None
        and shape[1] % 2 == 0
        and shape[0] % 8 == 0
        and shape[1] // 2 >= SPLIT2D_MIN_Y2
    ):
        return None
    if (
        SPLIT2D_REDUCED
        and hasattr(problem, "reduced2d_fields")
        and tuple(getattr(problem, "split2d_x_offsets", ())) == (1,)
    ):
        return None
    plan2d = split2d_plan(
        shape,
        getattr(problem, "split2d_x_offsets", (-1, 1)),
        x_cover=geom.shape[0] - 1,
    )
    if plan2d is None:
        return None
    B, T2, _ = plan2d
    fn = make_split_color_slab_2d(
        problem, geom, dtype, B,
        sweeps_per_call=T2, interpret=interpret, raw=True,
    )
    X, Y = shape
    Y2p = _round_up(Y // 2, 128)
    split_pad, merge = make_color_converters_2d(
        X, Y, Y2p, dtype, interpret
    )
    return fn, split_pad, merge

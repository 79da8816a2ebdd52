"""Fused coarse-subtree V-cycle kernels: the whole multigrid recursion
below a cutoff level as ONE Pallas kernel, with every deeper level living
purely in VMEM/vector registers.

Why: in the correction scheme the coarse levels are mathematically pure
temporaries of a V-cycle — coarse v is zeroed on entry and coarse f is
overwritten by restriction before every use (cycles.CycleProgram.v_cycle,
mirroring reference MultiGrid1D.cpp:150-175).  Yet FMG visits level l in
nu0*(l+1) V-cycles per step, so the XLA-scheduled version pays hundreds
of tiny kernel launches, strided-gather transfers, and zero-fills per
step on levels that hold a few hundred KB.  Measured on TPU v5e at 129^3
FMG(2,100,100): ~9 ms of the 21 ms step was this fixed coarse-level
overhead.  Fusing the subtree turns one whole V-cycle rooted at a coarse
level into a single kernel launch and eliminates the HBM round-trips for
every level below the root.

TPU-native op choices (all hardware-verified, scripts/probe_subtree_ops.py):
  * relaxation: masked two-color VPU updates on whole-array values
    (same math as ops/pallas/relax._sweeps);
  * residual:   problem.kernel_operator with wrap rolls;
  * restriction: [1/4,1/2,1/4] roll-smoothing per axis, then x-subsample
    via a layout-free (X,2,Y,Z) reshape and y/z subsampling as exact
    MXU pick-matrix contractions (strided slices on tile dims are not
    lowerable; 0/1 picks are, and the 3-term bf16 data split keeps them
    bitwise-exact on the bf16 MXU);
  * prolongation: x interleave via stack+reshape, y/z as exact MXU
    contractions with {1, 1/2} interpolation matrices (powers of two —
    exact in bf16).

Reference ops covered per level: Relax / CalculateResidual / Restrict /
Interpolate / ApplyCorrection / Set (SURVEY.md §2.2), composed exactly as
cycles.CycleProgram.v_cycle does for wrap-storage levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_multigrid_tpu.ops.pallas import relax as R

# VMEM cost model (bytes of (8,128)-tile-padded storage):
#   fully fused v-cycle:   ~8 arrays' worth per level (v, f, out, roll
#                          temps) — dominated by the root
#   correction-only root:  ~4x the root (v and f stay live, one temp
#                          chain, the prolonged error/out) plus the fused
#                          deeper subtree
FUSED_VMEM_BUDGET = 10 * 2**20
CORR_VMEM_BUDGET = 14 * 2**20
# merged-layout root: ~6 merged arrays (v, f, out, roll temps); the
# level-pair transfers stay in merged/coarse shapes (no unmerged root
# intermediates — see _pair64_mats)
MERGED_ROOT_BUDGET = 14 * 2**20
# run in-kernel sweeps of DEEPER mergeable levels in the merged
# (X, Y*Z/128, 128) layout (2-8x less tile-padding VPU waste than the
# lane-padded sub-lane form), converting at relax boundaries via the
# exact double-dot terms of _lay_terms.  Module flag for A/B timing.
MERGE_DEEP = True
# additionally store the in-kernel sweeps COLOR-SPLIT ((X, Y2*Z/128,
# 128) halves): every gathered neighbor is used, so each sweep does
# half the dense masked update's arithmetic.  The dense<->split
# conversions (exact pick dots through the unmerged layout) run once
# per relax leg.  Measured on v5e at 129^3 FMG nu=100: a WASH — the
# per-leg conversion chains cancel the halved sweep arithmetic
# (interleaved deltas +0.6/-0.8 ms, scripts/ab_split_merged.py) — so
# OFF by default; a direct merged->split-merged conversion (no unmerged
# intermediate) is the known path to tip the balance.
SPLIT_MERGED = False


def _pad_bytes(shape) -> int:
    X, Y, Z = shape
    return X * -(Y // -8) * 8 * -(Z // -128) * 128 * 4


def _subtree_ok(problem, geoms) -> bool:
    return all(
        g.wrap and g.ndim == 3 for g in geoms
    ) and all(
        hasattr(problem, n)
        for n in ("kernel_update", "kernel_operator", "kernel_precompute")
    )


def _xeinsum(spec, m, a):
    """einsum(spec, m, a), bitwise-exact on the bf16 MXU: `m` is a pick /
    power-of-two interpolation matrix (exactly representable), the data
    side `a` is split into three bf16 terms (3x8 mantissa bits cover
    f32's 24), each partial product f32-accumulated."""
    h1 = a.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = a - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    h3 = r1 - h2
    return sum(
        jnp.einsum(spec, m, h, preferred_element_type=jnp.float32)
        for h in (h1, h2, h3)
    )


def _transfer_mats(geoms):
    """Per level pair (k, k+1): restriction subsample picks and periodic
    prolongation interpolation matrices for the y and z axes (the x axis
    uses layout-free reshapes instead)."""
    mats = []
    for gf, gc in zip(geoms[:-1], geoms[1:]):
        _, Yf, Zf = gf.padded_shape
        _, Yc, Zc = gc.padded_shape
        pyr = np.zeros((Yc, Yf), np.float32)
        pyr[np.arange(Yc), 2 * np.arange(Yc)] = 1.0
        pzr = np.zeros((Zc, Zf), np.float32)
        pzr[np.arange(Zc), 2 * np.arange(Zc)] = 1.0
        pyp = np.zeros((Yf, Yc), np.float32)
        pyp[2 * np.arange(Yc), np.arange(Yc)] = 1.0
        pyp[2 * np.arange(Yc) + 1, np.arange(Yc)] = 0.5
        pyp[2 * np.arange(Yc) + 1, (np.arange(Yc) + 1) % Yc] = 0.5
        pzp = np.zeros((Zf, Zc), np.float32)
        pzp[2 * np.arange(Zc), np.arange(Zc)] = 1.0
        pzp[2 * np.arange(Zc) + 1, np.arange(Zc)] = 0.5
        pzp[2 * np.arange(Zc) + 1, (np.arange(Zc) + 1) % Zc] = 0.5
        mats.append(tuple(jnp.asarray(m) for m in (pyr, pzr, pyp, pzp)))
    return mats


def _merged_masks_and_shift(geom, dtype):
    """Merged-layout ((X, M, 128) view of a wrap (X, Y, Z) level) masks
    and geometric shift, mirroring relax.make_merged_resident_relax."""
    X, Y, Z = geom.padded_shape
    M = (Y * Z) // 128
    zbits = Z.bit_length() - 1
    shape = (X, M, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    flat = jax.lax.broadcasted_iota(jnp.int32, shape, 1) * 128 + lane
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gy = flat >> zbits
    gz = flat & (Z - 1)
    interior = (gx >= 1) & (gy >= 1) & (gz >= 1)
    par = (gx + gy + gz) % 2
    m_red = ((par == 0) & interior).astype(dtype)
    m_black = ((par == 1) & interior).astype(dtype)
    m_int = interior.astype(dtype)

    def flat_shift(a, s: int):
        b = jnp.roll(a, -s, axis=2)

        def carry(x, d):
            return x if M == 1 else jnp.roll(x, d, axis=1)

        if s > 0:
            return jnp.where(lane < 128 - s, b, carry(b, -1))
        return jnp.where(lane >= -s, b, carry(b, 1))

    def geom_shift(a, axis: int, off: int):
        if axis == 0:
            return jnp.roll(a, -off, axis=0)
        if axis == 1:
            return flat_shift(a, off * Z)
        return flat_shift(a, off)

    return m_red, m_black, m_int, geom_shift


def _split_masks_and_shift(geom, dtype):
    """Color-split merged-layout ((X, Y2*Z/128, 128) view of the (X, Y/2,
    Z) color halves) q-parity selector, per-color interior masks, and
    flat shift, mirroring relax.make_split_merged_relax: with q =
    (x + z) % 2, red points of row (x, z) sit at y = 2j + q, so red is
    interior iff j >= 1 or q == 1 (and x, z interior), black likewise
    with ~q."""
    X, Y, Z = geom.padded_shape
    M2 = ((Y // 2) * Z) // 128
    zbits = Z.bit_length() - 1
    shape = (X, M2, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    flat = jax.lax.broadcasted_iota(jnp.int32, shape, 1) * 128 + lane
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gj = flat >> zbits
    gz = flat & (Z - 1)
    q1 = ((gx + gz) % 2) == 1
    ok = (gx >= 1) & (gz >= 1)
    m_r = (((gj >= 1) | q1) & ok).astype(dtype)
    m_b = (((gj >= 1) | ~q1) & ok).astype(dtype)

    def fshift(a, s: int):
        b = jnp.roll(a, -s, axis=2)

        def carry(x, d):
            # M2 == 1: the row carry is the identity (a zero-size slice
            # Mosaic rejects)
            return x if M2 == 1 else jnp.roll(x, d, axis=1)

        if s > 0:
            return jnp.where(lane < 128 - s, b, carry(b, -1))
        return jnp.where(lane >= -s, b, carry(b, 1))

    return q1, m_r, m_b, fshift


def _split_sweeps(problem, geom, rm, bm, frm, fbm, ns, dtype):
    """ns red-black sweeps on color-split merged-layout halves — the same
    update order as the dense masked sweeps (red reads black, black reads
    the updated red), at half the arithmetic.  Wrap-correct with the full
    halves resident: x-rolls wrap onto the dense x=0 boundary plane,
    z-carries land on the dense z=0 plane, j-wraps on dense y<=1 rows
    whose reads are boundary values by the q-parity case split (see
    relax.make_split_merged_relax)."""
    Z = geom.padded_shape[2]
    q1, m_r, m_b, fshift = _split_masks_and_shift(geom, dtype)

    def one(_, rb):
        r, b = rb
        pairs = (
            jnp.roll(b, 1, axis=0) + jnp.roll(b, -1, axis=0),
            b + jnp.where(q1, fshift(b, Z), fshift(b, -Z)),
            fshift(b, -1) + fshift(b, 1),
        )
        r = r + m_r * (problem.split_update(pairs, frm, geom) - r)
        pairs = (
            jnp.roll(r, 1, axis=0) + jnp.roll(r, -1, axis=0),
            r + jnp.where(q1, fshift(r, -Z), fshift(r, Z)),
            fshift(r, -1) + fshift(r, 1),
        )
        b = b + m_b * (problem.split_update(pairs, fbm, geom) - b)
        return r, b

    if ns == 1:
        return one(0, (rm, bm))
    return jax.lax.fori_loop(0, ns, one, (rm, bm))


def _par_terms(Y: int):
    """Iota-built y-parity pick/scatter matrices: A0/A1 (Y2, Y) extract
    y = 2j / 2j+1; E0/E1 (Y, Y2) scatter them back."""
    Y2 = Y // 2
    ji, yi = _iota2((Y2, Y))
    A0 = _f32(yi == 2 * ji)
    A1 = _f32(yi == 2 * ji + 1)
    yi2, ji2 = _iota2((Y, Y2))
    E0 = _f32(yi2 == 2 * ji2)
    E1 = _f32(yi2 == 2 * ji2 + 1)
    return A0, A1, E0, E1


def _can_split_merge(problem, geom) -> bool:
    X, Y, Z = geom.padded_shape
    return (
        SPLIT_MERGED
        and _can_merge(problem, geom)
        and hasattr(problem, "split_update")
        and Y % 2 == 0
        and ((Y // 2) * Z) % 128 == 0
    )


def _can_merge(problem, geom) -> bool:
    """Level can be held in the merged (X, Y*Z/128, 128) layout in-kernel
    (zero or reduced tile waste vs the 4-8x of lane-padded sub-lane
    arrays)."""
    X, Y, Z = geom.padded_shape
    return (
        geom.wrap
        and geom.ndim == 3
        and Z < 128
        and (Y * Z) % 128 == 0
        and hasattr(problem, "merged_update")
    )


def _level_bytes(problem, geom) -> int:
    """In-kernel VMEM bytes for one array of this level in its chosen
    representation."""
    X, Y, Z = geom.padded_shape
    if _can_merge(problem, geom):
        M = (Y * Z) // 128
        return X * max(M, 8) * 128 * 4
    return _pad_bytes(geom.padded_shape)


def _f32(b):
    return b.astype(jnp.float32)


def _iota2(shape):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return i, j


def _lay_terms(geom):
    """In-kernel iota-built 0/1 matrices converting one x-slice between
    the unmerged (Y, Z) and merged (M, 128) layouts: merged row m holds
    y in [K*m, K*(m+1)) for K = 128/Z, so
        unmerged = sum_j A_j @ merged @ Bt_j
        merged   = sum_j At_j @ unmerged @ B_j
    with A_j (Y, M) picking y = K*m + j and B_j (Z, 128) picking lanes
    l = j*Z + z (At/Bt built directly — a transpose of a traced 2D value
    changes the lane extent, which Mosaic rejects)."""
    _, Y, Z = geom.padded_shape
    return _lay_terms_yz(Y, Z)


def _lay_terms_yz(Y: int, Z: int):
    """_lay_terms for an explicit (Y, Z) tail shape — also used for the
    (Y/2, Z) color halves of the split-merged sweeps."""
    K = 128 // Z
    M = (Y * Z) // 128
    terms = []
    for j in range(K):
        yi, mi = _iota2((Y, M))
        A = _f32(yi == K * mi + j)
        mi2, yi2 = _iota2((M, Y))
        At = _f32(yi2 == K * mi2 + j)
        zi, li = _iota2((Z, 128))
        B = _f32(li == j * Z + zi)
        li2, zi2 = _iota2((128, Z))
        Bt = _f32(li2 == j * Z + zi2)
        terms.append((A, At, B, Bt))
    return terms


def _zp_entry(r, c, Zf, Zc):
    """Periodic linear-interpolation matrix entry zp[r, c] for the z
    upsample Zc -> Zf (out[2c]=a[c], out[2c+1]=(a[c]+a[(c+1)%Zc])/2),
    as elementwise iota math (all entries powers of two)."""
    return (
        _f32(r == 2 * c)
        + 0.5 * _f32(r == 2 * c + 1)
        + 0.5 * _f32((2 * c - r) % Zf == 1)
    )


def _pair64_mats(Zf: int):
    """Iota-built lane matrices for DIRECT transfers between a merged
    Z=64 level (rows m <-> y-pair (2m, 2m+1), even y on lanes [0, 64))
    and its unmerged coarse level:
      restriction: coarse[x', m, k] = smoothed[2x', m, lane 2k]
      prolongation: lanes [0,64) <- z-interp of coarse row m (even fine
      y), lanes [64,128) <- z-interp of the (m, m+1 wrap) average."""
    Zc = Zf // 2
    li, ki = _iota2((128, Zc))
    br = _f32(li == 2 * ki)
    ki2, li2 = _iota2((Zc, 128))
    be = jnp.where(li2 < Zf, _zp_entry(li2, ki2, Zf, Zc), 0.0)
    bo = jnp.where(li2 >= Zf, _zp_entry(li2 - Zf, ki2, Zf, Zc), 0.0)
    return br, be, bo


def _build(
    problem,
    geoms,
    dtype,
    nu1,
    nu2,
    mu,
    with_root_relax,
    interpret,
    root_merged=False,
    coarsest_exact=False,
):
    """One fused kernel over `geoms` (root first).  with_root_relax=True
    fuses the complete V-cycle rooted at geoms[0]; False fuses only the
    coarse-grid correction (the root's own nu1/nu2 relaxation stays in
    the caller's dedicated relax kernel — used when the root level is too
    large for the ~8x value-temporary footprint of in-kernel sweeps).

    root_merged=True (implies with_root_relax) keeps the ROOT level in
    the merged (X, Y*Z/128, 128) layout in-kernel — its roll temporaries
    are tile-waste-free, which fits a 64^3 root's full V-cycle where the
    unmerged form cannot.  Only the residual (down) and the prolonged
    error (up) cross layouts, via the K=128/Z separable double-dot terms
    of _layout_mats."""
    geoms = list(geoms)
    K = len(geoms)
    mats_np = _transfer_mats(geoms)
    flat_mats = [m for quad in mats_np for m in quad]
    n_exact = 0
    if coarsest_exact:
        # fast-diagonalization coarsest solve in-kernel (ops/fastdiag.py
        # semantics): per-axis Q / Q^T sine bases + the precomputed
        # 1/lambda-sum field, all passed as operands (kernels cannot
        # capture array constants).  The MXU rounds Q to bf16 per
        # _xeinsum's data-side-only split — a ~0.4%-perturbed coarse
        # SOLVE, which leaves the outer fixed point untouched (the
        # residuals feeding it are exact) and costs ~nothing in
        # convergence rate.
        from pde_multigrid_tpu.ops import fastdiag

        gm = geoms[-1]
        axmats = fastdiag.padded_axis_mats(gm, np.float64)
        lam_sum = 0.0
        for ax, (_, lp) in enumerate(axmats):
            shape = [1] * 3
            shape[ax] = lp.shape[0]
            lam_sum = lam_sum + lp.reshape(shape)
        npdt = np.dtype(dtype)
        inv = (
            1.0 / np.where(lam_sum == 0, 1.0, lam_sum)
        ).astype(npdt)
        # numpy (literal-embedding) operands, like _transfer_mats
        exact_mats = []
        for Qp, _ in axmats:
            exact_mats.append(Qp.astype(npdt))
            exact_mats.append(Qp.T.copy().astype(npdt))
        exact_mats.append(inv)
        n_exact = len(exact_mats)
        flat_mats = flat_mats + exact_mats
    deep_merged = [
        MERGE_DEEP and k > 0 and _can_merge(problem, geoms[k])
        for k in range(K)
    ]
    deep_split = [
        deep_merged[k] and _can_split_merge(problem, geoms[k])
        for k in range(K)
    ]
    root_split = root_merged and _can_split_merge(problem, geoms[0])

    def roll(a, ax, off):
        return jnp.roll(a, -off, axis=ax)

    def kernel(v_ref, f_ref, *rest):
        n_t = 4 * (K - 1)
        mat_refs = rest[:n_t]
        exact_refs = rest[n_t : n_t + n_exact]
        (o_ref,) = rest[n_t + n_exact :]
        mats = [
            tuple(mat_refs[4 * k + i][:] for i in range(4))
            for k in range(K - 1)
        ]

        def _xapply(m2d, a):
            """out[a_, y, z] = sum_x m2d[a_, x] * a[x, y, z] — the
            leading-axis contraction unrolled as broadcast multiply-adds
            (Mosaic cannot shape-cast (X, Y, Z) -> (X, Y*Z) for a dot,
            and leading-dim value slices/broadcasts are free).  Pure f32
            VPU arithmetic — no MXU bf16 rounding on this axis."""
            out = m2d[:, 0:1][:, :, None] * a[0][None]
            for x in range(1, a.shape[0]):
                out = out + m2d[:, x : x + 1][:, :, None] * a[x][None]
            return out

        def exact_coarse(f):
            """v = Q diag(1/lam) Q^T f, per-axis contractions (the
            spectral coefficients of the zero-padded boundary rows are
            exactly zero, so the guarded inv entries never matter)."""
            qs = [exact_refs[2 * ax][:] for ax in range(3)]
            qts = [exact_refs[2 * ax + 1][:] for ax in range(3)]
            inv_f = exact_refs[6][:]
            g = _xapply(qts[0], f)
            g = _xeinsum("by,ayz->abz", qts[1], g)
            g = _xeinsum("cz,abz->abc", qts[2], g)
            g = g * inv_f
            g = _xapply(qs[0], g)
            g = _xeinsum("yb,xbc->xyc", qs[1], g)
            return _xeinsum("zc,xyc->xyz", qs[2], g)
        # masks/pre are recomputed at each use (pure iota math): hoisting
        # them keeps every level's three mask arrays live across the
        # whole kernel and blows the scoped-VMEM stack budget
        def masks(k):
            g = geoms[k]
            return R._coords_and_masks(problem, g, g.padded_shape, 0, dtype)

        def to_m_yz(Y, Z, a):
            """Unmerged (X, Y, Z) value -> merged (X, Y*Z/128, 128)."""
            out = 0.0
            for _, At, B, _ in _lay_terms_yz(Y, Z):
                t = _xeinsum("my,xyz->xmz", At, a)
                out = out + _xeinsum("zl,xmz->xml", B, t)
            return out

        def to_u_yz(Y, Z, a):
            """Merged value -> unmerged (X, Y, Z).  Lanes are contracted
            FIRST so every intermediate is the small (X, M, Z) shape
            (contracting y first materializes (X, Y, 128) temps, which
            blew the scoped-VMEM stack at the 64^3 merged root)."""
            out = 0.0
            for A, _, _, Bt in _lay_terms_yz(Y, Z):
                t = _xeinsum("lz,xml->xmz", Bt, a)
                out = out + _xeinsum("ym,xmz->xyz", A, t)
            return out

        def to_m(k, a):
            _, Y, Z = geoms[k].padded_shape
            return to_m_yz(Y, Z, a)

        def to_u(k, a):
            _, Y, Z = geoms[k].padded_shape
            return to_u_yz(Y, Z, a)

        def relax_split(k, v, f, ns):
            """Sweeps on color-split merged halves: half the dense masked
            update's arithmetic; the exact pick-dot conversions run once
            per leg.  Same update order (red, then black reading the
            updated red) as the dense path — results differ only by the
            conversions' (exact) dots, i.e. not at all."""
            g = geoms[k]
            X, Y, Z = g.padded_shape
            Y2 = Y // 2
            A0, A1, E0, E1 = _par_terms(Y)
            ix = jax.lax.broadcasted_iota(jnp.int32, (X, 1, Z), 0)
            iz = jax.lax.broadcasted_iota(jnp.int32, (X, 1, Z), 2)
            qu = ((ix + iz) % 2) == 1

            def split(a):
                s0 = _xeinsum("jy,xyz->xjz", A0, a)
                s1 = _xeinsum("jy,xyz->xjz", A1, a)
                return jnp.where(qu, s1, s0), jnp.where(qu, s0, s1)

            r, b = split(v)
            fr, fb = split(f)
            rm, bm = _split_sweeps(
                problem,
                g,
                to_m_yz(Y2, Z, r),
                to_m_yz(Y2, Z, b),
                to_m_yz(Y2, Z, fr),
                to_m_yz(Y2, Z, fb),
                ns,
                dtype,
            )
            r, b = to_u_yz(Y2, Z, rm), to_u_yz(Y2, Z, bm)
            return _xeinsum(
                "yj,xjz->xyz", E0, jnp.where(qu, b, r)
            ) + _xeinsum("yj,xjz->xyz", E1, jnp.where(qu, r, b))

        def relax(k, v, f, ns):
            if deep_split[k]:
                return relax_split(k, v, f, ns)
            if deep_merged[k]:
                # sweeps in the merged layout (tile-waste-free VPU work);
                # the conversions amortize over the ns sweeps
                vm, fm = to_m(k, v), to_m(k, f)
                mr, mb, _, gshift = _merged_masks_and_shift(
                    geoms[k], dtype
                )

                def one(_, w):
                    w = w + mr * (
                        problem.merged_update(w, fm, gshift, geoms[k]) - w
                    )
                    w = w + mb * (
                        problem.merged_update(w, fm, gshift, geoms[k]) - w
                    )
                    return w

                vm = (
                    one(0, vm)
                    if ns == 1
                    else jax.lax.fori_loop(0, ns, one, vm)
                )
                return to_u(k, vm)
            pre, mr, mb = masks(k)
            return R._sweeps(problem, geoms[k], v, f, pre, mr, mb, ns)

        def m_int(k):
            _, mr, mb = masks(k)
            return mr + mb  # disjoint 1.0 masks

        def residual(k, v, f):
            lv = problem.kernel_operator(v, geoms[k], roll)
            return m_int(k) * (f - lv)

        def subsample(k, a):
            """Even-index subsample on all axes, fine k -> coarse k+1."""
            pyr, pzr, _, _ = mats[k]
            Xf = geoms[k].padded_shape[0]
            a = a.reshape(Xf // 2, 2, *a.shape[1:])[:, 0]
            t = _xeinsum("cY,xYZ->xcZ", pyr, a)
            return _xeinsum("dZ,xcZ->xcd", pzr, t)

        def restrict(k, r):
            """Full weighting, matching stencil.restrict_full_weighting:
            separable [1/4,1/2,1/4] smoothing, even subsample, coarse
            boundary = injection (wrap m_log is all-ones)."""
            a = r
            for ax in range(3):
                a = 0.25 * roll(a, ax, -1) + 0.5 * a + 0.25 * roll(a, ax, 1)
            sm = subsample(k, a)
            inj = subsample(k, r)
            return inj + m_int(k + 1) * (sm - inj)

        def prolong(k, c):
            """Periodic (wrap-storage) trilinear prolongation, matching
            stencil.prolong_linear(periodic=True): per-axis m -> 2m with
            out[2i] = a[i], out[2i+1] = (a[i] + a[(i+1) % m]) / 2."""
            _, _, pyp, pzp = mats[k]
            mid = 0.5 * (c + jnp.roll(c, -1, axis=0))
            a = jnp.stack([c, mid], axis=1).reshape(-1, *c.shape[1:])
            a = _xeinsum("fY,xYZ->xfZ", pyp, a)
            return _xeinsum("fZ,xcZ->xcf", pzp, a)

        def correction(k, v, f):
            cf = restrict(k, residual(k, v, f))
            cv = jnp.zeros(geoms[k + 1].padded_shape, dtype)
            for _ in range(mu):
                cv = vcyc(k + 1, cv, cf)
            return v + m_int(k) * prolong(k, cv)

        def vcyc(k, v, f):
            if coarsest_exact and k == K - 1:
                return exact_coarse(f)
            v = relax(k, v, f, nu1)
            if k < K - 1:
                v = correction(k, v, f)
            return relax(k, v, f, nu2)

        v, f = v_ref[:], f_ref[:]
        if root_merged and coarsest_exact and K == 1:
            # single-level subtree AT the coarsest: the "V-cycle" is the
            # exact solve itself (the relax-only root path would leave a
            # smoother where the cycle contract requires a solver)
            o_ref[:] = to_m(0, exact_coarse(to_u(0, f)))
            return
        if root_merged:
            # merged masks and the lane iota are likewise rebuilt at each
            # use site to keep their live ranges short
            def relax_root(vm, fm, ns):
                if root_split:
                    # through the unmerged layout to color-split halves
                    # once per leg; sweeps at half the dense arithmetic
                    u = relax_split(0, to_u(0, vm), to_u(0, fm), ns)
                    return to_m(0, u)
                mr_m, mb_m, _, gshift = _merged_masks_and_shift(
                    geoms[0], dtype
                )

                def one(_, vm):
                    vm = vm + mr_m * (
                        problem.merged_update(vm, fm, gshift, geoms[0]) - vm
                    )
                    vm = vm + mb_m * (
                        problem.merged_update(vm, fm, gshift, geoms[0]) - vm
                    )
                    return vm

                if ns == 1:
                    return one(0, vm)
                return jax.lax.fori_loop(0, ns, one, vm)

            v = relax_root(v, f, nu1)
            if K > 1:
                br, be, bo = _pair64_mats(geoms[0].padded_shape[2])
                _, _, mi_m, gshift = _merged_masks_and_shift(
                    geoms[0], dtype
                )
                r_m = mi_m * (
                    f - problem.kernel_operator(v, geoms[0], gshift)
                )
                # restrict straight out of the merged layout: smooth
                # with geometric shifts, even-x reshape, lane pick-dot
                # (even-y rows ARE the merged rows, see _pair64_mats)
                a = r_m
                for ax in range(3):
                    a = (
                        0.25 * gshift(a, ax, -1)
                        + 0.5 * a
                        + 0.25 * gshift(a, ax, 1)
                    )

                def subm(x):
                    x = x.reshape(
                        x.shape[0] // 2, 2, *x.shape[1:]
                    )[:, 0]
                    return _xeinsum("lK,xml->xmK", br, x)

                sm, inj = subm(a), subm(r_m)
                cf = inj + m_int(1) * (sm - inj)
                cv = jnp.zeros(geoms[1].padded_shape, dtype)
                for _ in range(mu):
                    cv = vcyc(1, cv, cf)
                # prolong straight into the merged layout: x interleave,
                # even-y lanes from the z-interp of coarse row m, odd-y
                # lanes from the z-interp of the (m, m+1 wrap) average
                mid = 0.5 * (cv + jnp.roll(cv, -1, axis=0))
                a = jnp.stack([cv, mid], axis=1).reshape(
                    -1, *cv.shape[1:]
                )
                yavg = 0.5 * (a + jnp.roll(a, -1, axis=1))
                err_m = _xeinsum("Kl,xmK->xml", be, a) + _xeinsum(
                    "Kl,xmK->xml", bo, yavg
                )
                _, _, mi_m2, _ = _merged_masks_and_shift(geoms[0], dtype)
                v = v + mi_m2 * err_m
            o_ref[:] = relax_root(v, f, nu2)
            return
        o_ref[:] = (
            vcyc(0, v, f) if with_root_relax else correction(0, v, f)
        )

    X0, Y0, Z0 = geoms[0].padded_shape
    kshape = (
        (X0, (Y0 * Z0) // 128, 128) if root_merged else (X0, Y0, Z0)
    )
    # the split-merged root's per-leg layout conversions peak ~2.4MB over
    # the default 16MB scoped-vmem stack; this kernel is whole-level
    # resident (no grid pipelining to starve), so raise the limit
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=28 * 2**20)
        if root_merged and root_split
        else None
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(kshape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 + len(flat_mats)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=interpret,
    )

    if root_merged:

        def run(v, f):
            out = call(
                v.reshape(kshape), f.reshape(kshape), *flat_mats
            )
            return out.reshape(X0, Y0, Z0)

        return run

    def run(v, f):
        return call(v, f, *flat_mats)

    return run


def _interior_mask(geom, dtype):
    """Wrap-storage interior mask built from iotas (index 0 per axis is
    the zero boundary plane, everything else stored is interior)."""
    shape = geom.padded_shape
    m = None
    for d in range(3):
        ok = jax.lax.broadcasted_iota(jnp.int32, shape, d) >= 1
        m = ok if m is None else m & ok
    return m.astype(dtype)


# budget for the single-pair resident transfer kernels below: whole fine
# array + temps in VMEM
SMALL_XFER_BUDGET = 6 * 2**20


def _small_pair_ok(geom_f, geom_c) -> bool:
    return (
        geom_f.wrap
        and geom_c.wrap
        and geom_f.ndim == 3
        and _pad_bytes(geom_f.padded_shape) * 6 <= SMALL_XFER_BUDGET
    )


def make_small_restrict(geom_f, geom_c, dtype, interpret=False):
    """Resident full-weighting restriction kernel for one sub-lane wrap
    level pair (fine -> coarse), problem-independent.  Replaces the XLA
    strided-gather fallback used by FMG's f-cascade and by V-cycles at
    levels the fused-subtree kernels don't cover (the XLA version runs
    far below roofline and costs a separate launch per op)."""
    if not _small_pair_ok(geom_f, geom_c):
        return None
    (pyr, pzr, _, _), = _transfer_mats([geom_f, geom_c])

    def kernel(a_ref, pyr_ref, pzr_ref, o_ref):
        r = a_ref[:]
        a = r
        for ax in range(3):
            a = (
                0.25 * jnp.roll(a, 1, axis=ax)
                + 0.5 * a
                + 0.25 * jnp.roll(a, -1, axis=ax)
            )

        def sub(x):
            x = x.reshape(x.shape[0] // 2, 2, *x.shape[1:])[:, 0]
            t = _xeinsum("cY,xYZ->xcZ", pyr_ref[:], x)
            return _xeinsum("dZ,xcZ->xcd", pzr_ref[:], t)

        sm, inj = sub(a), sub(r)
        o_ref[:] = inj + _interior_mask(geom_c, dtype) * (sm - inj)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(geom_c.padded_shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return lambda a: call(a, pyr, pzr)


def make_small_prolong_blend(geom_c, geom_f, dtype, mode, interpret=False):
    """Resident periodic trilinear prolong + blend kernel for one
    sub-lane wrap level pair (coarse -> fine):
      mode 'add':     base + m_int * P(c)      (V-cycle correction)
      mode 'replace': base + m_int * (P(c) - base)   (FMG upward leg)."""
    if not _small_pair_ok(geom_f, geom_c):
        return None
    (_, _, pyp, pzp), = _transfer_mats([geom_f, geom_c])

    def kernel(c_ref, b_ref, pyp_ref, pzp_ref, o_ref):
        c = c_ref[:]
        mid = 0.5 * (c + jnp.roll(c, -1, axis=0))
        a = jnp.stack([c, mid], axis=1).reshape(-1, *c.shape[1:])
        a = _xeinsum("fY,xYZ->xfZ", pyp_ref[:], a)
        p = _xeinsum("fZ,xcZ->xcf", pzp_ref[:], a)
        base = b_ref[:]
        m = _interior_mask(geom_f, dtype)
        if mode == "add":
            o_ref[:] = base + m * p
        else:
            o_ref[:] = base + m * (p - base)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(geom_f.padded_shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return lambda c, base: call(c, base, pyp, pzp)


def plan_fused_cycles(problem, geoms, dtype, cycle, interpret=False):
    """(fused_vcycle_fns, fused_correction_fns), each a per-level list.

    fused_vcycle_fns[l](v, f) runs a COMPLETE V-cycle rooted at level l;
    fused_correction_fns[l](v, f) runs only the coarse-grid correction
    for level l (caller relaxes).  None where the subtree doesn't qualify
    (non-wrap / non-3D levels, unsupported problem, smoother, scheme, or
    VMEM budget)."""
    n = len(geoms)
    vfns: list = [None] * n
    cfns: list = [None] * n
    if cycle is None or cycle.smoother != "rbgs" or cycle.scheme != "cs":
        return vfns, cfns
    exact = getattr(cycle, "coarsest", "relax") == "exact"
    if exact and not (
        geoms[-1].wrap
        and geoms[-1].ndim == 3
        and getattr(problem, "separable_fastdiag", lambda g: False)(
            geoms[-1]
        )
    ):
        # the jnp tier will raise a config error; no fused kernels here
        return vfns, cfns
    for l in range(n - 1, -1, -1):
        sub = geoms[l:]
        if not _subtree_ok(problem, sub):
            continue
        if exact and l == n - 1 and max(sub[0].padded_shape) > 32:
            # a large coarsest level solves exactly via the XLA fastdiag
            # path (6 HIGHEST-precision einsums) — the in-kernel unrolled
            # form busts the scoped-VMEM stack above 32^3
            continue
        deeper = sum(_pad_bytes(g.padded_shape) for g in sub[1:])
        root = _pad_bytes(sub[0].padded_shape)
        X0, Y0, Z0 = sub[0].padded_shape
        mroot = _level_bytes(problem, sub[0])
        if 8 * (root + deeper) <= FUSED_VMEM_BUDGET:
            vfns[l] = _build(
                problem, sub, dtype, cycle.nu1, cycle.nu2, cycle.mu,
                True, interpret, coarsest_exact=exact,
            )
        elif (
            _can_merge(problem, sub[0])
            # the direct level-pair transfers of _pair64_mats need
            # K = 128/Z == 2 (merged row m <-> the y-pair (2m, 2m+1))
            and Z0 * 2 == 128
            and Y0 % 2 == 0
            and 6 * mroot + 8 * deeper <= MERGED_ROOT_BUDGET
        ):
            # full V-cycle with the root kept in merged layout in-kernel
            # (roll temps tile-waste-free; only the residual/error cross
            # layouts, via exact double-dot terms)
            vfns[l] = _build(
                problem, sub, dtype, cycle.nu1, cycle.nu2, cycle.mu,
                True, interpret, root_merged=True, coarsest_exact=exact,
            )
        elif l + 1 < n and vfns[l + 1] is not None and (
            4 * root + 8 * deeper <= CORR_VMEM_BUDGET
        ):
            cfns[l] = _build(
                problem, sub, dtype, cycle.nu1, cycle.nu2, cycle.mu,
                False, interpret, coarsest_exact=exact,
            )
    return vfns, cfns

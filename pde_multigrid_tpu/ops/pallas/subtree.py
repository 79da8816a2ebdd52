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


def _build(problem, geoms, dtype, nu1, nu2, mu, with_root_relax, interpret):
    """One fused kernel over `geoms` (root first).  with_root_relax=True
    fuses the complete V-cycle rooted at geoms[0]; False fuses only the
    coarse-grid correction (the root's own nu1/nu2 relaxation stays in
    the caller's dedicated relax kernel — used when the root level is too
    large for the ~8x value-temporary footprint of in-kernel sweeps)."""
    geoms = list(geoms)
    K = len(geoms)
    mats_np = _transfer_mats(geoms)
    flat_mats = [m for quad in mats_np for m in quad]

    def roll(a, ax, off):
        return jnp.roll(a, -off, axis=ax)

    def kernel(v_ref, f_ref, *rest):
        mat_refs, (o_ref,) = rest[: 4 * (K - 1)], rest[4 * (K - 1) :]
        mats = [
            tuple(mat_refs[4 * k + i][:] for i in range(4))
            for k in range(K - 1)
        ]
        masks = [
            R._coords_and_masks(problem, g, g.padded_shape, 0, dtype)
            for g in geoms
        ]

        def relax(k, v, f, ns):
            pre, mr, mb = masks[k]
            return R._sweeps(problem, geoms[k], v, f, pre, mr, mb, ns)

        def m_int(k):
            _, mr, mb = masks[k]
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
            v = relax(k, v, f, nu1)
            if k < K - 1:
                v = correction(k, v, f)
            return relax(k, v, f, nu2)

        v, f = v_ref[:], f_ref[:]
        o_ref[:] = (
            vcyc(0, v, f) if with_root_relax else correction(0, v, f)
        )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(geoms[0].padded_shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 + len(flat_mats)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

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
    for l in range(n - 1, -1, -1):
        sub = geoms[l:]
        if not _subtree_ok(problem, sub):
            continue
        deeper = sum(_pad_bytes(g.padded_shape) for g in sub[1:])
        root = _pad_bytes(sub[0].padded_shape)
        if 8 * (root + deeper) <= FUSED_VMEM_BUDGET:
            vfns[l] = _build(
                problem, sub, dtype, cycle.nu1, cycle.nu2, cycle.mu,
                True, interpret,
            )
        elif l + 1 < n and vfns[l + 1] is not None and (
            4 * root + 8 * deeper <= CORR_VMEM_BUDGET
        ):
            cfns[l] = _build(
                problem, sub, dtype, cycle.nu1, cycle.nu2, cycle.mu,
                False, interpret,
            )
    return vfns, cfns

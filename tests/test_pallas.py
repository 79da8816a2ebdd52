"""Pallas kernel tier vs jnp reference tier (interpreter mode on CPU).

The fused kernels must be algorithm-identical to ops.stencil.relax_rbgs
(same two-color sweep ordering); tolerances only allow for
reciprocal-vs-divide rounding."""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_multigrid_tpu.grid import Hierarchy
from pde_multigrid_tpu.models import Lyapunov2D, Ode1D, Poisson
from pde_multigrid_tpu.ops import stencil
from pde_multigrid_tpu.ops.pallas import relax as R
from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    SolverConfig,
)

RNG = np.random.default_rng(7)
F32 = jnp.dtype("float32")


def _rand_level(prob, n, **build_kw):
    h = Hierarchy.build(prob, n, **build_kw)
    lvl, geom = h.levels[0], h.geoms[0]
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    f = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    return lvl, geom, v, f


def _jnp_relax(prob, lvl, geom, v, f, n):
    return stencil.relax_rbgs(
        lambda vv, ff: prob.relax_update(vv, ff, geom, lvl.aux),
        v,
        f,
        lvl.aux["m_red"],
        lvl.aux["m_black"],
        n,
    )


@pytest.mark.parametrize(
    "prob,n",
    [
        (Poisson(1), 33),
        (Poisson(2), 17),
        (Poisson(3), 9),
        (Ode1D(), 33),
        (Lyapunov2D(), 17),
    ],
    ids=lambda p: getattr(p, "name", str(p)),
)
def test_resident_kernel_matches_jnp(prob, n):
    lvl, geom, v, f = _rand_level(prob, n)
    fn = R.make_resident_relax(prob, geom, F32, interpret=True)
    got = np.asarray(fn(v, f, 3))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("B,T", [(4, 1), (8, 1), (4, 2), (8, 2)])
def test_slab_kernel_matches_jnp_3d(B, T):
    prob = Poisson(3)
    lvl, geom, v, f = _rand_level(
        prob, 17, pad_last_to=128, pad_sublane_to=8
    )
    fn = R.make_slab_relax(prob, geom, F32, B, T, interpret=True)
    got = np.asarray(fn(v, f, 5))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_slab_kernel_matches_jnp_2d():
    prob = Poisson(2)
    lvl, geom, v, f = _rand_level(
        prob, 65, pad_last_to=128, pad_sublane_to=8
    )
    fn = R.make_slab_relax(prob, geom, F32, 16, 2, interpret=True)
    got = np.asarray(fn(v, f, 3))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_slab_kernel_matches_jnp_2d_nonwrap():
    """Non-wrap 2D (nonzero Dirichlet -> padded 2^k+1 storage): axis 0 is
    the sublane dim, so the slab kernel must keep every axis-0 DMA slice
    8-aligned (regression: Mosaic rejected the ext=20 window the 3D-tuned
    halo produced on lyapunov2d levels)."""
    prob = Lyapunov2D()
    lvl, geom, v, f = _rand_level(
        prob, 65, pad_last_to=128, pad_sublane_to=8
    )
    assert not geom.wrap
    fn = R.make_slab_relax(prob, geom, F32, 8, 1, interpret=True)
    got = np.asarray(fn(v, f, 3))
    want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_full_solve_pallas_backend_matches_jnp():
    """End-to-end FMG with backend='pallas' (forced, interpreter mode on
    CPU) must match the jnp backend to float32 tolerance."""
    cfg_p = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2), backend="pallas"
    )
    cfg_j = SolverConfig(cycle=CycleConfig("fmg", 1, 2, 2), backend="jnp")
    rp = MultigridSolver(Poisson(3), 17, cfg_p).solve()
    rj = MultigridSolver(Poisson(3), 17, cfg_j).solve()
    assert abs(rp.error_linf - rj.error_linf) < 1e-6
    assert abs(rp.residual_l2 - rj.residual_l2) < 1e-5
    from pde_multigrid_tpu.ops.pallas.dispatch import PallasKernels

    assert isinstance(
        MultigridSolver(Poisson(3), 17, cfg_p).program.kernels,
        PallasKernels,
    )


def test_fused_subtree_vcycle_matches_jnp():
    """Whole-subtree fused V-cycle kernel (ops/pallas/subtree.py) ==
    CycleProgram.v_cycle on the jnp tier, for both variants: the fully
    fused V-cycle and the correction-only root (forced via a tiny VMEM
    budget so the 32^3 root takes the correction path)."""
    from pde_multigrid_tpu.cycles import CycleProgram, JnpKernels
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.ops.pallas import subtree

    prob = Poisson(3)
    h = Hierarchy.build(
        prob, 33, pad_last_to=128, pad_sublane_to=8, wrap=True
    )
    cfg = CycleConfig("v", 0, 2, 3)  # nu1 != nu2: catches leg swaps
    prog = CycleProgram(prob, h.geoms, cfg, JnpKernels(prob, h.geoms))
    rng = np.random.default_rng(11)
    levels = h.levels
    lvl0 = levels[0]
    v = jnp.asarray(
        rng.standard_normal(h.geoms[0].padded_shape).astype(np.float32)
    ) * lvl0.aux["m_int"]
    f = lvl0.f
    levels = (
        type(lvl0)(v=v, f=f, aux=lvl0.aux),
    ) + tuple(levels[1:])
    want = np.asarray(prog.v_cycle(levels, 0)[0].v)

    vfns, cfns = subtree.plan_fused_cycles(
        prob, h.geoms, F32, cfg, interpret=True
    )
    assert vfns[0] is not None
    got = np.asarray(vfns[0](v, f))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)

    # correction-only path: shrink the fused budget so the root level
    # falls back to the correction kernel + out-of-kernel relax
    orig = subtree.FUSED_VMEM_BUDGET, subtree.MERGED_ROOT_BUDGET
    try:
        subtree.FUSED_VMEM_BUDGET = 2 * 2**20
        subtree.MERGED_ROOT_BUDGET = 0
        vfns2, cfns2 = subtree.plan_fused_cycles(
            prob, h.geoms, F32, cfg, interpret=True
        )
    finally:
        subtree.FUSED_VMEM_BUDGET, subtree.MERGED_ROOT_BUDGET = orig
    assert vfns2[0] is None and cfns2[0] is not None

    # merged-root variant (the 64^3 / Z=64 path): root relaxed and
    # residualed in merged layout, level-pair transfers via the direct
    # lane-dot terms of _pair64_mats
    h64 = Hierarchy.build(
        prob, 65, pad_last_to=128, pad_sublane_to=8, wrap=True
    )
    assert subtree._can_merge(prob, h64.geoms[0])
    assert h64.geoms[0].padded_shape[2] == 64
    prog64 = CycleProgram(
        prob, h64.geoms, cfg, JnpKernels(prob, h64.geoms)
    )
    l64 = h64.levels
    v64 = jnp.asarray(
        rng.standard_normal(h64.geoms[0].padded_shape).astype(np.float32)
    ) * l64[0].aux["m_int"]
    lv64 = (
        type(l64[0])(v=v64, f=l64[0].f, aux=l64[0].aux),
    ) + tuple(l64[1:])
    want64 = np.asarray(prog64.v_cycle(lv64, 0)[0].v)
    fn_m = subtree._build(
        prob, h64.geoms, F32, cfg.nu1, cfg.nu2, cfg.mu,
        True, True, root_merged=True,
    )
    got_m = np.asarray(fn_m(v64, l64[0].f))
    np.testing.assert_allclose(got_m, want64, rtol=3e-5, atol=3e-6)

    # color-split in-kernel sweeps (subtree.SPLIT_MERGED, off by default
    # — measured a wash on v5e — but kept correct): same contract
    try:
        subtree.SPLIT_MERGED = True
        fn_s = subtree._build(
            prob, h64.geoms, F32, cfg.nu1, cfg.nu2, cfg.mu,
            True, True, root_merged=True,
        )
    finally:
        subtree.SPLIT_MERGED = False
    got_s = np.asarray(fn_s(v64, l64[0].f))
    np.testing.assert_allclose(got_s, want64, rtol=3e-5, atol=3e-6)

    aux = levels[0].aux
    v1 = stencil.relax_rbgs(
        lambda vv, ff: prob.relax_update(vv, ff, h.geoms[0], aux),
        v, f, aux["m_red"], aux["m_black"], cfg.nu1,
    )
    v2 = jnp.asarray(cfns2[0](v1, f))
    got2 = np.asarray(
        stencil.relax_rbgs(
            lambda vv, ff: prob.relax_update(vv, ff, h.geoms[0], aux),
            v2, f, aux["m_red"], aux["m_black"], cfg.nu2,
        )
    )
    np.testing.assert_allclose(got2, want, rtol=3e-5, atol=3e-6)


def test_small_transfer_kernels_match_stencil():
    """Single-pair resident restrict / prolong-blend kernels for sub-lane
    wrap pairs == the stencil jnp ops (used by FMG's f-cascade and upward
    leg where the big slab transfer kernels don't apply)."""
    from pde_multigrid_tpu.grid import Hierarchy, base_aux
    from pde_multigrid_tpu.ops.pallas import subtree

    prob = Poisson(3)
    h = Hierarchy.build(
        prob, 65, pad_last_to=128, pad_sublane_to=8, wrap=True
    )
    gf, gc = h.geoms[1], h.geoms[2]  # 32^3 -> 16^3 (both sub-lane)
    auxc = base_aux(gc)
    auxf = base_aux(gf)
    rng = np.random.default_rng(5)
    fine = jnp.asarray(
        rng.standard_normal(gf.padded_shape).astype(np.float32)
    )
    rs = subtree.make_small_restrict(gf, gc, F32, interpret=True)
    got = np.asarray(rs(fine))
    want = np.asarray(
        stencil.restrict_full_weighting(
            fine, auxc["m_int"], auxc["m_log"]
        )
    )
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)

    coarse = jnp.asarray(
        rng.standard_normal(gc.padded_shape).astype(np.float32)
    )
    base = jnp.asarray(
        rng.standard_normal(gf.padded_shape).astype(np.float32)
    )
    p = stencil.prolong_linear(coarse, gf.padded_shape, periodic=True)
    for mode, want in (
        ("add", base + auxf["m_int"] * p),
        ("replace", base + auxf["m_int"] * (p - base)),
    ):
        pb = subtree.make_small_prolong_blend(
            gc, gf, F32, mode, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(pb(coarse, base)),
            np.asarray(want),
            rtol=3e-5,
            atol=3e-6,
        )


def test_plan_relax_covers_all_levels_3d():
    """On tile-aligned hierarchies every 3D level gets a fused kernel."""
    prob = Poisson(3)
    h = Hierarchy.build(prob, 33, pad_last_to=128, pad_sublane_to=8)
    for g in h.geoms:
        assert R.plan_relax(prob, g, F32, interpret=True) is not None


# ---------------------------------------------- split-color slab kernel


def _wrap_level(prob, n):
    from pde_multigrid_tpu.grid import base_aux, build_geometries

    geoms = build_geometries((n,) * prob.ndim, prob.domain, wrap=True)
    geom = geoms[0]
    assert geom.wrap
    aux = base_aux(geom)
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
        * np.asarray(aux["m_int"])
    )
    f = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    return geoms, geom, aux, v, f


@pytest.mark.parametrize("B,T", [(4, 1), (8, 1), (4, 2), (4, 3)])
def test_split_slab_kernel_matches_jnp(B, T):
    """Color-split storage relaxation == dense masked relaxation (same
    update order; float results differ only at rounding level)."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, 17)
    fn = R.make_split_slab_relax(
        prob, geom, F32, B, sweeps_per_call=T, interpret=True
    )
    for ns in (1, 4):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                v,
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n,T", [(17, 2), (33, 3)])
def test_split_timeskew_kernel_matches_jnp(n, T):
    """Time-skewed wavefront relaxation == dense masked relaxation:
    the parallelogram schedule computes exactly the global red->black
    ordering (red_s from black_{s-1} planes only).  nsweeps choices
    exercise the single-chunk, chained-chunks, and remainder paths."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, n)
    fn = R.make_split_timeskew_relax(
        prob, geom, F32, sweeps_per_call=T, interpret=True
    )
    for ns in (1, T, 2 * T + 1):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                v,
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n", [129, 1025])
def test_split_resident_1d_matches_jnp(n):
    """1D color-split resident kernel == dense masked relaxation (same
    blend form and term order; lane-split red/black halves)."""
    from pde_multigrid_tpu.grid import base_aux, build_geometries

    prob = Ode1D()
    geoms = build_geometries((n,), prob.domain, None, pad_last_to=128)
    geom = geoms[0]
    aux = prob.make_aux(geom) if hasattr(prob, "make_aux") else base_aux(
        geom
    )
    aux = {**base_aux(geom), **(aux or {})}
    v = jnp.asarray(RNG.standard_normal(geom.padded_shape).astype(
        np.float32))
    f = jnp.asarray(RNG.standard_normal(geom.padded_shape).astype(
        np.float32))
    fn = R.make_split_resident_relax_1d(prob, geom, F32, interpret=True)
    for ns in (1, 5):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                v,
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        # padding beyond the logical extent is masked/inert — compare
        # the stored points only
        np.testing.assert_allclose(
            got[: geom.shape[0]], want[: geom.shape[0]],
            rtol=2e-5, atol=2e-6,
        )


@pytest.mark.parametrize("n,B", [(17, 8), (33, 8), (33, 16)])
def test_split_resident_sweeps_matches_jnp(n, B):
    """ALL-sweeps-resident error-equation kernel == dense masked sweeps
    from a zero start (homogeneous-Dirichlet wrap level): small-n
    interpret-mode parity for the hoisted-mask / re-zero-row-0 /
    padding-row scheme, independent of test_mixed's end-to-end
    tolerance checks."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, n)
    X, Y, Z = geom.padded_shape
    qb = R._split_qmask(X, Z)
    fr, fb = R.split_colors(f, qb)
    fn = R.make_split_resident_sweeps(
        prob, geom, F32, B, interpret=True, iterate_dtype=jnp.float32
    )
    for ns in (1, 4):
        er, eb = fn(None, None, fr, fb, ns, v_zero=True)
        got = np.asarray(R.merge_colors(er, eb, qb))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                jnp.zeros_like(v),
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n,T,Bj", [(65, 2, 8), (65, 2, 16)])
def test_split_timeskew_jb_kernel_matches_jnp(n, T, Bj):
    """j-blocked (2.5D) time-skew == dense masked relaxation: clipped
    j-windows with an appended always-zero column reproduce the
    full-plane wrap-to-zero roll semantics at both real y boundaries,
    and the round_up(2T, 8)-column j-halos keep owned columns exact."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, n)
    fn = R.make_split_timeskew_relax_jb(
        prob, geom, F32, sweeps_per_call=T, block_j=Bj, interpret=True
    )
    for ns in (1, 2 * T + 1):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                v,
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n", [17, 33])
def test_split_merged_kernel_matches_jnp(n):
    """Color-split merged-layout resident kernel (the coarse-level tier)
    == dense masked relaxation; exercises every wrap case (x-roll,
    z-carry, j-wrap onto dense y=0)."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, n)
    fn = R.make_split_merged_relax(prob, geom, F32, interpret=True)
    for ns in (1, 3):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                v,
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("B,Bj,T", [(4, 8, 1), (8, 8, 2)])
def test_split_slab_2d_kernel_matches_jnp(B, Bj, T):
    """x-and-y-blocked split storage relaxation == dense masked relaxation
    (the 257^3-class tier; exercises j-halo clamping at both y edges)."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, 65)
    fn = R.make_split_slab_relax_2d(
        prob, geom, F32, B, Bj, sweeps_per_call=T, interpret=True
    )
    for ns in (1, 3):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(
            stencil.relax_rbgs(
                lambda vv, ff: prob.relax_update(vv, ff, geom, aux),
                v,
                f,
                aux["m_red"],
                aux["m_black"],
                ns,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pallas_color_converters_bitwise():
    """MXU pick-matrix split/merge == XLA split_colors/merge_colors,
    bit for bit (0/1 picks + hi/lo bf16 reconstruction are exact).
    129^3: lane-aligned, so the real pallas tier runs (not the XLA
    fallback taken below 128 lanes)."""
    prob = Poisson(3)
    geoms, geom, aux, v, f = _wrap_level(prob, 129)
    X, Y, Z = geom.padded_shape
    assert Z % 128 == 0  # must exercise the pallas tier
    qb = R._split_qmask(X, Z)
    csplit, cmerge = R.make_color_converters(geom, F32, interpret=True)
    r0, b0 = R.split_colors(v, qb)
    r1, b1 = csplit(v)
    assert np.array_equal(np.asarray(r0), np.asarray(r1))
    assert np.array_equal(np.asarray(b0), np.asarray(b1))
    v0 = R.merge_colors(r0, b0, qb)
    v1 = cmerge(r1, b1)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))


def test_split_colors_roundtrip():
    from pde_multigrid_tpu.ops.pallas.relax import (
        _split_qmask,
        merge_colors,
        split_colors,
    )

    a = jnp.asarray(RNG.standard_normal((8, 8, 8)).astype(np.float32))
    qb = _split_qmask(8, 8)
    r, b = split_colors(a, qb)
    back = np.asarray(merge_colors(r, b, qb))
    np.testing.assert_array_equal(back, np.asarray(a))


# ------------------------------------------------ fused transfer kernels


@pytest.mark.parametrize("block_rows", [None, 4, 2])
def test_fused_residual_restrict_matches_jnp(block_rows):
    """block_rows=4/2 are the auto-shrunk configs the 257^3-class levels
    select to fit scoped VMEM (_auto_restrict_rows)."""
    from pde_multigrid_tpu.cycles import JnpKernels
    from pde_multigrid_tpu.grid import base_aux
    from pde_multigrid_tpu.ops.pallas import transfer as T

    prob = Poisson(3)
    geoms, gf, auxf, v, f = _wrap_level(prob, 17)
    gc = geoms[1]
    auxc = base_aux(gc)
    jk = JnpKernels(prob, geoms)
    rr = T.make_residual_restrict(
        prob, gf, gc, F32, interpret=True, block_rows=block_rows
    )
    got = np.asarray(rr(v, f))
    r = jk.residual(0, v, f, auxf)
    want = np.asarray(jk.restrict(0, r, auxc["m_int"], auxc["m_log"]))
    # atol covers per-axis accumulation-order differences: the kernel
    # subsamples x before resampling y/z, the jnp tier after
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-4)
    # restrict-only variant must also match on data with nonzero
    # boundary values (FMG RHS cascade injects the fine boundary)
    ro = T.make_residual_restrict(
        prob, gf, gc, F32, interpret=True, with_residual=False
    )
    got = np.asarray(ro(f))
    want = np.asarray(jk.restrict(0, f, auxc["m_int"], auxc["m_log"]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_residual_matches_jnp():
    """Standalone fused residual kernel (modulo-indexed neighbor blocks)
    == jnp tier, including the x-wrap rows at both ends."""
    from pde_multigrid_tpu.cycles import JnpKernels
    from pde_multigrid_tpu.ops.pallas import transfer as T

    prob = Poisson(3)
    geoms, gf, auxf, v, f = _wrap_level(prob, 129)
    jk = JnpKernels(prob, geoms)
    res = T.make_residual(prob, gf, F32, interpret=True)
    assert res is not None
    got = np.asarray(res(v, v, v, f))
    want = np.asarray(jk.residual(0, v, f, auxf))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["add", "replace"])
@pytest.mark.parametrize("block_rows", [None, 8, 4])
def test_fused_prolong_blend_matches_jnp(mode, block_rows):
    from pde_multigrid_tpu.cycles import JnpKernels
    from pde_multigrid_tpu.ops.pallas import transfer as T

    prob = Poisson(3)
    geoms, gf, auxf, v, f = _wrap_level(prob, 17)
    gc = geoms[1]
    cv = RNG.standard_normal(gc.padded_shape).astype(np.float32)
    for a in range(3):  # wrap invariant: stored plane 0 is the boundary
        sl = [slice(None)] * 3
        sl[a] = 0
        cv[tuple(sl)] = 0.0
    cv = jnp.asarray(cv)
    jk = JnpKernels(prob, geoms)
    pb = T.make_prolong_blend(
        gc, gf, F32, mode, interpret=True, block_rows=block_rows
    )
    got = np.asarray(pb(cv, v))
    up = jk.prolong(0, cv)
    if mode == "add":
        want = np.asarray(v + auxf["m_int"] * up)
    else:
        want = np.asarray(v + auxf["m_int"] * (up - v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B,T", [(8, 1), (8, 4), (16, 2), (8, 8)])
def test_split_color_slab_2d_matches_jnp(B, T):
    """2D color-split slab kernel (padded storage, lane-dim split,
    q = x%2) == dense masked relaxation for both the one-sided Lyapunov
    stencil and the 5-point Poisson stencil."""
    for prob in (Lyapunov2D(), Poisson(2)):
        h = Hierarchy.build(
            prob, 33, pad_last_to=128, pad_sublane_to=8
        )
        lvl, geom = h.levels[0], h.geoms[0]
        assert not geom.wrap
        v = jnp.asarray(
            RNG.standard_normal(geom.padded_shape).astype(np.float32)
        )
        f = jnp.asarray(
            RNG.standard_normal(geom.padded_shape).astype(np.float32)
        )
        fn = R.make_split_color_slab_2d(
            prob, geom, F32, B, sweeps_per_call=T, interpret=True
        )
        for ns in (1, 5):
            got = np.asarray(fn(v, f, ns))
            want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, ns))
            np.testing.assert_allclose(
                got, want, rtol=2e-5, atol=2e-6,
                err_msg=f"{prob.name} B={B} T={T} ns={ns}",
            )


@pytest.mark.parametrize("B,T", [(8, 1), (8, 4)])
def test_split_color_slab_2d_f_zero(B, T):
    """f_zero=True (RHS stream dropped from the kernel entirely) ==
    relaxing against an explicit zero RHS, regardless of what garbage is
    passed as f."""
    for prob in (Lyapunov2D(), Poisson(2)):
        h = Hierarchy.build(prob, 33, pad_last_to=128, pad_sublane_to=8)
        geom = h.geoms[0]
        v = jnp.asarray(
            RNG.standard_normal(geom.padded_shape).astype(np.float32)
        )
        garbage = jnp.asarray(
            RNG.standard_normal(geom.padded_shape).astype(np.float32)
        )
        zeros = jnp.zeros(geom.padded_shape, jnp.float32)
        fn = R.make_split_color_slab_2d(
            prob, geom, F32, B, sweeps_per_call=T, interpret=True
        )
        assert fn.supports_f_zero
        for ns in (1, 5):
            got = np.asarray(fn(v, garbage, ns, f_zero=True))
            want = np.asarray(fn(v, zeros, ns))
            np.testing.assert_allclose(
                got, want, rtol=1e-6, atol=1e-7,
                err_msg=f"{prob.name} B={B} T={T} ns={ns}",
            )


def test_split2d_min_y2_gate_full_solve():
    """Lowering SPLIT2D_MIN_Y2 engages the 2D color-split kernel on
    small levels; a full forced-pallas lyapunov solve must still match
    the jnp tier (exercises the planner + f_zero threading end-to-end)."""
    from pde_multigrid_tpu import Lyapunov2D as L2D

    orig = R.SPLIT2D_MIN_Y2
    try:
        R.SPLIT2D_MIN_Y2 = 16
        cfg_p = SolverConfig(
            cycle=CycleConfig("fmg", 1, 2, 2), backend="pallas",
            pad_last_to=128,
        )
        rp = MultigridSolver(L2D(), 33, cfg_p).solve()
    finally:
        R.SPLIT2D_MIN_Y2 = orig
    cfg_j = SolverConfig(cycle=CycleConfig("fmg", 1, 2, 2), backend="jnp")
    rj = MultigridSolver(L2D(), 33, cfg_j).solve()
    assert abs(rp.error_linf - rj.error_linf) < 1e-5
    assert abs(rp.residual_l2 - rj.residual_l2) < 1e-5


def test_resident_and_slab_f_zero():
    """f_zero variants of the resident and dense slab kernels (RHS
    stream dropped) == the same kernels with an explicit zero RHS."""
    for prob, n, mk in (
        (Lyapunov2D(), 17, "resident"),
        (Poisson(2), 65, "slab"),
        (Lyapunov2D(), 65, "slab"),
    ):
        h = Hierarchy.build(prob, n, pad_last_to=128, pad_sublane_to=8)
        geom = h.geoms[0]
        v = jnp.asarray(
            RNG.standard_normal(geom.padded_shape).astype(np.float32)
        )
        garbage = jnp.asarray(
            RNG.standard_normal(geom.padded_shape).astype(np.float32)
        )
        zeros = jnp.zeros(geom.padded_shape, jnp.float32)
        if mk == "resident":
            fn = R.make_resident_relax(prob, geom, F32, interpret=True)
        else:
            fn = R.make_slab_relax(prob, geom, F32, 8, 1, interpret=True)
        assert fn.supports_f_zero
        for ns in (1, 3):
            got = np.asarray(fn(v, garbage, ns, f_zero=True))
            want = np.asarray(fn(v, zeros, ns))
            np.testing.assert_allclose(
                got, want, rtol=1e-6, atol=1e-7,
                err_msg=f"{prob.name} {mk} ns={ns}",
            )


def test_planner_tier_selection_at_bench_sizes():
    """Guard the production kernel-tier choices at the benchmark sizes
    (geometry-only — no arrays): regressions here silently drop hot
    levels to the jnp tier (it happened: the 2D VMEM model once
    overcounted 8x and ran 2049^2 relax via XLA)."""
    from pde_multigrid_tpu.grid import build_geometries

    def tier(prob, n, ndim, wrap):
        geoms = build_geometries(
            (n,) * ndim, prob.domain, None,
            pad_last_to=128, pad_sublane_to=8, wrap=wrap,
        )
        fn = R.plan_relax(prob, geoms[0], F32, interpret=True)
        return None if fn is None else fn.__qualname__.split(".")[0]

    assert tier(Lyapunov2D(), 2049, 2, False) == (
        "make_split_color_slab_2d"
    )
    assert tier(Lyapunov2D(), 4097, 2, False) == (
        "make_split_color_slab_2d"
    )
    # MIN_Y2=256 default (hardware-A/B'd): 513^2-class levels split too
    assert tier(Lyapunov2D(), 513, 2, False) == (
        "make_split_color_slab_2d"
    )
    # 3D wrap slab-tier levels take the time-skewed wavefront (2.5x
    # over the trapezoids at 257^3, hardware-A/B'd) once the half-plane
    # is big enough to feed it (129^3's 8K-point planes measured
    # faster on the trapezoid slab); 513^3 planes are too large for
    # the full-plane ring set and take the j-blocked (2.5D) variant
    assert tier(Poisson(3), 129, 3, True) == "make_split_slab_relax"
    assert tier(Poisson(3), 257, 3, True) == "make_split_timeskew_relax"
    assert tier(Poisson(3), 513, 3, True) == (
        "make_split_timeskew_relax_jb"
    )
    assert tier(Ode1D(), 8193, 1, False) == (
        "make_split_resident_relax_1d"
    )


@pytest.mark.parametrize("n", [129, 1025])
def test_split_resident_1d_layouts_bitwise_equal(n):
    """Full-tile (R, 128) layout == single-row (1, N/2) layout bitwise.

    Pins the row-seam east-neighbor logic (black reads red at flat
    i+1): n=129 exercises the R == 1 arm (no seam select at all — the
    arm whose jnp.roll(axis=0) formulation produced a zero-size slice
    the Mosaic compiler rejects, KERNELS.md §1D full-tile), n=1025 the
    R > 1 column-0-concatenate seam.

    LIMITATION (ADVICE r4): interpret=True ACCEPTS the zero-size-slice
    formulation Mosaic rejects, so this test pins only the numerical
    layout equivalence — the hardware-lowering regression is instead
    caught by the bench ode1d row itself (it compiles this kernel on
    the real Mosaic service and fails fast), not by this CPU suite."""
    from pde_multigrid_tpu.grid import build_geometries

    prob = Ode1D()
    geom = build_geometries((n,), prob.domain, None, pad_last_to=128)[0]
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32))
    f = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32))
    tiles = R.make_split_resident_relax_1d(
        prob, geom, F32, interpret=True, full_tiles=True)
    row = R.make_split_resident_relax_1d(
        prob, geom, F32, interpret=True, full_tiles=False)
    for ns in (1, 7):
        np.testing.assert_array_equal(
            np.asarray(tiles(v, f, ns)), np.asarray(row(v, f, ns)))


@pytest.mark.parametrize("B,T", [(8, 1), (8, 2), (16, 4)])
def test_split_reduced_slab_2d_matches_jnp(B, T):
    """Reduced-system (black-only) kernel: one full RBGS sweep as a
    single 3-term black update + per-chunk red reconstruction ==
    dense masked RBGS, for the one-sided Lyapunov stencil (the only
    eligible family).  Tolerance-based: the precomputed coefficient
    products (Cxx = ae_b*ae_r, ...) reassociate the FP arithmetic."""
    prob = Lyapunov2D()
    h = Hierarchy.build(prob, 33, pad_last_to=128, pad_sublane_to=8)
    lvl, geom = h.levels[0], h.geoms[0]
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    f = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    fn = R.make_split_reduced_slab_2d(
        prob, geom, F32, B, sweeps_per_call=T, interpret=True
    )
    for ns in (1, 2, 5):
        got = np.asarray(fn(v, f, ns))
        want = np.asarray(_jnp_relax(prob, lvl, geom, v, f, ns))
        np.testing.assert_allclose(
            got, want, rtol=2e-5, atol=2e-6,
            err_msg=f"B={B} T={T} ns={ns}",
        )


def test_split_reduced_slab_2d_f_zero():
    """Reduced kernel's f_zero path (all RHS terms dropped from Cf and
    the red reconstruction) == explicit zero RHS."""
    prob = Lyapunov2D()
    h = Hierarchy.build(prob, 33, pad_last_to=128, pad_sublane_to=8)
    geom = h.geoms[0]
    v = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    garbage = jnp.asarray(
        RNG.standard_normal(geom.padded_shape).astype(np.float32)
    )
    zeros = jnp.zeros(geom.padded_shape, jnp.float32)
    fn = R.make_split_reduced_slab_2d(
        prob, geom, F32, 8, sweeps_per_call=2, interpret=True
    )
    assert fn.supports_f_zero
    for ns in (1, 5):
        got = np.asarray(fn(v, garbage, ns, f_zero=True))
        want = np.asarray(fn(v, zeros, ns))
        np.testing.assert_allclose(
            got, want, rtol=1e-6, atol=1e-7, err_msg=f"ns={ns}"
        )


def test_split2d_reduced_gate_full_solve():
    """PDE_MG_SPLIT2D_REDUCED engages the reduced kernel in the
    planner; a full forced-pallas lyapunov solve must still match the
    jnp tier end-to-end."""
    from pde_multigrid_tpu import Lyapunov2D as L2D

    orig_y2, orig_red = R.SPLIT2D_MIN_Y2, R.SPLIT2D_REDUCED
    try:
        R.SPLIT2D_MIN_Y2 = 16
        R.SPLIT2D_REDUCED = True
        fn = R.plan_relax(L2D(), 
            Hierarchy.build(
                L2D(), 65, pad_last_to=128, pad_sublane_to=8
            ).geoms[0], F32, interpret=True)
        assert fn is not None
        cfg_p = SolverConfig(
            cycle=CycleConfig("fmg", 1, 2, 2), backend="pallas",
            pad_last_to=128,
        )
        rp = MultigridSolver(L2D(), 33, cfg_p).solve()
    finally:
        R.SPLIT2D_MIN_Y2 = orig_y2
        R.SPLIT2D_REDUCED = orig_red
    cfg_j = SolverConfig(cycle=CycleConfig("fmg", 1, 2, 2), backend="jnp")
    rj = MultigridSolver(L2D(), 33, cfg_j).solve()
    assert abs(rp.error_linf - rj.error_linf) < 1e-5
    assert abs(rp.residual_l2 - rj.residual_l2) < 1e-5


def test_pallas_2d_color_converters_bitwise():
    """MXU pick-dot 2D converters (dense->split+pad, merge) are
    bitwise-identical to the XLA reshape+select path (0/1 picks with
    the three-term bf16 data split are exact)."""
    for n in (33, 65):
        h = Hierarchy.build(
            Lyapunov2D(), n, pad_last_to=128, pad_sublane_to=8
        )
        geom = h.geoms[0]
        X, Y = geom.padded_shape
        Y2 = Y // 2
        Y2p = -(-Y2 // 128) * 128
        v = jnp.asarray(
            RNG.standard_normal((X, Y)).astype(np.float32)
        )
        qx = R._qx_mask(X)
        sc, p0, p1 = R._pallas_split_2d(
            X, Y, Y2p, F32, interpret=True
        )
        mc, u0, u1 = R._pallas_merge_2d(
            X, Y, Y2p, F32, interpret=True
        )
        r_k, b_k = sc(v, p0, p1)
        r_x, b_x = R.split_colors_2d(v, qx)
        pad = ((0, 0), (0, Y2p - Y2))
        np.testing.assert_array_equal(
            np.asarray(r_k), np.asarray(jnp.pad(r_x, pad))
        )
        np.testing.assert_array_equal(
            np.asarray(b_k), np.asarray(jnp.pad(b_x, pad))
        )
        v_k = mc(r_k, b_k, u0, u1)
        np.testing.assert_array_equal(np.asarray(v_k), np.asarray(v))


def test_xla_transfer_routing_when_fused_kernels_reject(monkeypatch):
    """PallasKernels must route restrict/prolong through the XLA MXU
    pick-matrix path when neither the fused nor the small resident
    transfer kernels engage (the 512^3 situation, which no CPU-sized
    test can reach directly — simulated by forcing the gates)."""
    import numpy as np
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.models import Poisson
    from pde_multigrid_tpu.ops import stencil
    from pde_multigrid_tpu.ops.pallas import dispatch as D
    from pde_multigrid_tpu.ops.pallas import subtree as sub
    from pde_multigrid_tpu.ops.pallas import transfer as T

    monkeypatch.setattr(T, "planner_ok", lambda gf, gc: False)
    monkeypatch.setattr(
        sub, "make_small_restrict", lambda *a, **k: None
    )
    monkeypatch.setattr(
        sub, "make_small_prolong_blend", lambda *a, **k: None
    )
    monkeypatch.setattr(
        T, "xla_pair_ok",
        lambda gf, gc: gf.wrap and gc.wrap and gf.ndim == 3,
    )
    prob = Poisson(3)
    h = Hierarchy.build(prob, 33, wrap=True)
    ker = D.PallasKernels(prob, h.geoms, jnp.float32, interpret=True)
    assert ker._xla_restrict[0] is not None
    assert ker._xla_prolong[0] is not None
    rng = np.random.default_rng(4)
    a = jnp.asarray(
        rng.standard_normal(h.geoms[0].padded_shape), jnp.float32
    )
    aux1 = h.levels[1].aux
    got = np.asarray(
        ker.restrict(0, a, aux1["m_int"], aux1["m_log"])
    )
    want = np.asarray(
        stencil.restrict_full_weighting(a, aux1["m_int"], aux1["m_log"])
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    c = jnp.asarray(
        rng.standard_normal(h.geoms[1].padded_shape), jnp.float32
    )
    got = np.asarray(ker.prolong(0, c))
    want = np.asarray(
        stencil.prolong_linear(
            c, h.geoms[0].padded_shape, periodic=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

"""Padding invariance + multi-device (GSPMD) equivalence tests on the
8-virtual-device CPU mesh (SURVEY.md §4 implication (d): single-chip vs
multi-chip tolerance equivalence)."""

import jax
import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson,
    Lyapunov2D,
    SolverConfig,
)
from pde_multigrid_tpu.parallel import mesh as pmesh


def _solve(problem, n, pad0=1, padl=1, cycles=2):
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2),
        pad_axis0_to=pad0,
        pad_last_to=padl,
        max_cycles=cycles,
        tol=0.0,
        storage="padded",  # these tests exercise padded storage explicitly
    )
    return MultigridSolver(problem, n, cfg)


def test_padding_is_inert_poisson2d():
    base = _solve(Poisson(2), 33).solve_to_tolerance()
    padded = _solve(Poisson(2), 33, pad0=8, padl=16).solve_to_tolerance()
    assert padded.v.shape == (40, 48)
    np.testing.assert_allclose(
        np.asarray(padded.v)[:33, :33],
        np.asarray(base.v),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        padded.residual_l2, base.residual_l2, rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        padded.error_linf, base.error_linf, rtol=1e-4
    )


def test_padding_is_inert_lyapunov2d():
    base = _solve(Lyapunov2D(), 33).solve_to_tolerance()
    padded = _solve(Lyapunov2D(), 33, pad0=4, padl=8).solve_to_tolerance()
    np.testing.assert_allclose(
        np.asarray(padded.v)[:33, :33],
        np.asarray(base.v),
        rtol=1e-5,
        atol=1e-6,
    )


def test_padding_is_inert_poisson1d():
    base = _solve(Poisson(1), 65).solve_to_tolerance()
    padded = _solve(Poisson(1), 65, pad0=8, padl=128).solve_to_tolerance()
    assert padded.v.shape == (128,)
    np.testing.assert_allclose(
        np.asarray(padded.v)[:65], np.asarray(base.v), rtol=1e-6, atol=1e-7
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_xla_transfers_match_jnp(monkeypatch):
    """ShardedKernels routes restrict/prolong through the XLA MXU
    pick-matrix transfers on qualifying pairs (VERDICT r4 #7) and the
    results match the jnp tier on genuinely sharded inputs.

    3D: gates forced open (the real 257^3-class engagement floor is
    CPU-unreachable); 2D: real gates at 513^2 (Y=640 >= 256).  Outputs
    are also pinned to the target level's sharding — the pin removes
    the GSPMD 'involuntary full rematerialization' warning tail of
    MULTICHIP_r04 (VERDICT r4 #6)."""
    from pde_multigrid_tpu.ops import stencil
    from pde_multigrid_tpu.parallel import sharded as S
    from pde_multigrid_tpu.ops.pallas import transfer as T

    monkeypatch.setattr(S, "SHARDED_XLA3D_MIN_YZ", 0)
    monkeypatch.setenv("PDE_MG_XLA2D_MIN_Y", "256")  # default-off tier
    monkeypatch.setattr(
        T, "xla_pair_ok",
        lambda gf, gc: gf.wrap and gc.wrap and gf.ndim == 3,
    )
    mesh = pmesh.make_mesh(8)
    for prob, n, kw in (
        (Poisson(3), 33, dict()),
        (Lyapunov2D(), 513, dict(pad_last_to=128, pad_sublane_to=8)),
    ):
        from pde_multigrid_tpu.grid import Hierarchy

        h = Hierarchy.build(
            prob, n, pad_axis0_to=8,
            wrap=(prob.ndim == 3), **kw,
        )
        ker = S.ShardedKernels(prob, h.geoms, mesh)
        assert ker._xla_restrict[0] is not None, prob.name
        levels = pmesh.shard_levels(mesh, h.levels, h.geoms)
        assert not levels[0].v.sharding.is_fully_replicated
        rng = np.random.default_rng(3)
        a_host = rng.standard_normal(h.geoms[0].padded_shape).astype(
            np.float32
        )
        a = jax.device_put(a_host, levels[0].v.sharding)
        aux1 = h.levels[1].aux
        got = np.asarray(
            jax.jit(
                lambda x: ker.restrict(
                    0, x, aux1["m_int"], aux1["m_log"]
                )
            )(a)
        )
        want = np.asarray(
            stencil.restrict_full_weighting(
                jax.numpy.asarray(a_host), aux1["m_int"], aux1["m_log"]
            )
        )
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-6, err_msg=prob.name
        )
        c_host = rng.standard_normal(h.geoms[1].padded_shape).astype(
            np.float32
        )
        m_int_f = np.asarray(h.levels[0].aux["m_int"])
        got = (
            np.asarray(
                jax.jit(lambda x: ker.prolong(0, x))(
                    jax.numpy.asarray(c_host)
                )
            )
            * m_int_f
        )
        want = (
            np.asarray(
                stencil.prolong_linear(
                    jax.numpy.asarray(c_host),
                    h.geoms[0].padded_shape,
                    periodic=h.geoms[0].wrap,
                )
            )
            * m_int_f
        )
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-6, err_msg=prob.name
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_solve_matches_single_device_poisson3d():
    """The full FMG program sharded over an 8-device mesh (x-plane
    decomposition, agglomerated coarse levels) must match the single-device
    result to float32 tolerance."""
    solver = _solve(Poisson(3), 33, pad0=8)
    step = jax.jit(solver.program.solve_step)

    single = step(step(solver.fresh_levels()))

    mesh = pmesh.make_mesh(8)
    levels = pmesh.shard_levels(mesh, solver.fresh_levels(), solver.geoms)
    # finest level really is distributed (33 >= min_shardable_extent(8)=24;
    # a replicated array also "spans" 8 devices, so check the spec itself)
    assert not levels[0].v.sharding.is_fully_replicated
    out = step(step(levels))
    np.testing.assert_allclose(
        np.asarray(out[0].v),
        np.asarray(single[0].v),
        rtol=2e-5,
        atol=2e-6,
    )
    # ... and the solve step preserved the distribution
    assert not out[0].v.sharding.is_fully_replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize(
    "prob,n",
    [(Poisson(3), 33), (Poisson(2), 65), (Lyapunov2D(), 65)],
    ids=lambda p: getattr(p, "name", str(p)),
)
def test_explicit_halo_exchange_matches_single_device(prob, n):
    """The shard_map + ppermute halo-exchange path (parallel/halo.py) must
    reproduce the single-device solve; only reciprocal-vs-divide rounding
    may differ (Poisson is bit-identical)."""
    from pde_multigrid_tpu.parallel.sharded import ShardedKernels

    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2), max_cycles=2, tol=0.0
    )
    single = MultigridSolver(prob, n, cfg).solve_to_tolerance()
    mesh = pmesh.make_mesh(8)
    ms = MultigridSolver(prob, n, cfg, mesh=mesh)
    assert isinstance(ms.program.kernels, ShardedKernels)
    assert any(f is not None for f in ms.program.kernels._sharded_relax)
    sharded = ms.solve_to_tolerance()
    v1, v2 = np.asarray(single.v), np.asarray(sharded.v)
    sl = tuple(slice(0, min(a, b)) for a, b in zip(v1.shape, v2.shape))
    np.testing.assert_allclose(v2[sl], v1[sl], rtol=2e-5, atol=2e-6)
    assert abs(sharded.error_linf - single.error_linf) < 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_halo_exchange_multi_chunk_sweeps():
    """T sweeps per exchange (trapezoidal chunking) stays exact."""
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.parallel import halo
    from pde_multigrid_tpu.ops import stencil
    import jax.numpy as jnp

    prob = Poisson(2)
    mesh = pmesh.make_mesh(8)
    h = Hierarchy.build(prob, 65, pad_axis0_to=8)
    lvl, geom = h.levels[0], h.geoms[0]
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)
    f = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)
    want = stencil.relax_rbgs(
        lambda vv, ff: prob.relax_update(vv, ff, geom, lvl.aux),
        v, f, lvl.aux["m_red"], lvl.aux["m_black"], 5,
    )
    fn = halo.make_sharded_relax(
        prob, geom, mesh, jnp.dtype("float32"), sweeps_per_exchange=2
    )
    got = fn(
        jax.device_put(v, pmesh.level_sharding(mesh, geom)),
        jax.device_put(f, pmesh.level_sharding(mesh, geom)),
        5,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("T", [1, 2])
def test_halo_overlap_matches_serial_schedule(T):
    """Overlapped halo schedule (interior sweeps while the ppermute is in
    flight, edge trapezoids recomputed from pre-chunk values + arrived
    halos) == the serial exchange->sweep schedule == the unsharded
    reference."""
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.parallel import halo
    from pde_multigrid_tpu.ops import stencil
    import jax.numpy as jnp

    for prob in (Poisson(2), Lyapunov2D()):
        mesh = pmesh.make_mesh(8)
        h = Hierarchy.build(prob, 65, pad_axis0_to=8)
        lvl, geom = h.levels[0], h.geoms[0]
        rng = np.random.default_rng(9)
        v = jnp.asarray(
            rng.standard_normal(geom.padded_shape), jnp.float32
        )
        f = jnp.asarray(
            rng.standard_normal(geom.padded_shape), jnp.float32
        )
        want = stencil.relax_rbgs(
            lambda vv, ff: prob.relax_update(vv, ff, geom, lvl.aux),
            v, f, lvl.aux["m_red"], lvl.aux["m_black"], 5,
        )
        outs = {}
        for ov in (False, True):
            fn = halo.make_sharded_relax(
                prob, geom, mesh, jnp.dtype("float32"),
                sweeps_per_exchange=T, overlap=ov,
            )
            outs[ov] = np.asarray(
                fn(
                    jax.device_put(v, pmesh.level_sharding(mesh, geom)),
                    jax.device_put(f, pmesh.level_sharding(mesh, geom)),
                    5,
                )
            )
        np.testing.assert_allclose(
            outs[True], outs[False], rtol=1e-6, atol=1e-7,
            err_msg=f"{prob.name} T={T} overlap vs serial",
        )
        np.testing.assert_allclose(
            outs[True], np.asarray(want), rtol=2e-5, atol=2e-6,
            err_msg=f"{prob.name} T={T} overlap vs unsharded",
        )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_coarse_levels_replicated():
    solver = _solve(Poisson(2), 33, pad0=4)
    mesh = pmesh.make_mesh(4)
    levels = pmesh.shard_levels(mesh, solver.fresh_levels(), solver.geoms)
    assert len(levels[0].v.sharding.device_set) == 4
    # coarsest (3x3 logical) must be replicated (agglomeration)
    assert levels[-1].v.sharding.is_fully_replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_exact_coarsest_converges():
    """coarsest='exact' under spatial sharding: the truncated hierarchy's
    fine levels stay x-plane-sharded (ppermute halo relaxation) while the
    exact coarse solve runs on the agglomerated replicated level."""
    from pde_multigrid_tpu import MultigridSolver, SolverConfig

    mesh = pmesh.make_mesh(8)
    s = MultigridSolver(
        Poisson(3),
        65,
        SolverConfig(
            cycle=CycleConfig("fmg", 1, 6, 6, coarsest="exact"),
            pad_axis0_to=8,
        ),
        mesh=mesh,
    )
    assert len(s.geoms) == 2  # truncated at the 33^3 exact level
    r = s.solve()
    h = 1.0 / 64
    assert r.error_linf < 50 * h * h


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("T", [2, 4])
def test_sharded_timeskew_bitwise_in_tier(T):
    """The sharded time-skew engine (per-shard wavefront chunks with
    2T-plane black halos ingested where the single-chip kernel uses the
    wrap-zero plane, parallel/halo.py) must reproduce the single-chip
    time-skew kernel BITWISE across the 8-device mesh, including
    remainder chunks (SCALING.md 'time-skew as the per-shard engine')."""
    import jax.numpy as jnp
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.ops.pallas import relax as R
    from pde_multigrid_tpu.parallel import halo

    prob = Poisson(3)
    mesh = pmesh.make_mesh(8)
    n = 33 if T == 2 else 65  # x_loc must host the 2T-plane halo
    h = Hierarchy.build(prob, n, wrap=True)
    lvl, geom = h.levels[0], h.geoms[0]
    rng = np.random.default_rng(5)
    v = (
        jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)
        * lvl.aux["m_int"]
    )
    f = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)
    single = R.make_split_timeskew_relax(
        prob, geom, jnp.float32, sweeps_per_call=T, interpret=True
    )
    fn = halo.make_sharded_relax(
        prob, geom, mesh, jnp.dtype("float32"), sweeps_per_exchange=T
    )
    s = pmesh.level_sharding(mesh, geom)
    for ns in (T, 2 * T + 1):  # full chunks + a remainder chunk
        got = np.asarray(
            fn(jax.device_put(v, s), jax.device_put(f, s), ns)
        )
        want = np.asarray(single(v, f, ns))
        np.testing.assert_array_equal(got, want, err_msg=f"T={T} ns={ns}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize(
    "prob,T",
    [(Lyapunov2D(), 4), (Lyapunov2D(), 2), (Poisson(2), 2)],
    ids=["lyap-T4", "lyap-T2", "poisson2d-T2"],
)
def test_sharded_split2d_bitwise_in_tier(prob, T):
    """The sharded 2D color-split slab engine (per-shard chunks with
    round_up(2T,8)-row halos on the x-sides the stencil reads,
    parallel/halo.py) must reproduce the single-chip split-slab kernel
    BITWISE across the 8-device mesh, including remainder chunks and
    both halo configurations (Lyapunov one-sided +1, Poisson symmetric)
    — VERDICT r3 #2."""
    import jax.numpy as jnp
    from pde_multigrid_tpu.grid import Hierarchy
    from pde_multigrid_tpu.ops.pallas import relax as R
    from pde_multigrid_tpu.parallel import halo

    mesh = pmesh.make_mesh(8)
    n = 257
    h = Hierarchy.build(
        prob, n, pad_axis0_to=64, pad_last_to=128, pad_sublane_to=8
    )
    lvl, geom = h.levels[0], h.geoms[0]
    assert geom.padded_shape[0] % (8 * 8) == 0  # x_loc % 8 == 0
    rng = np.random.default_rng(11)
    v = (
        jnp.asarray(
            rng.standard_normal(geom.padded_shape), jnp.float32
        )
        * lvl.aux["m_int"]
        + lvl.v
    )
    f = jnp.asarray(rng.standard_normal(geom.padded_shape), jnp.float32)
    single = R.make_split_color_slab_2d(
        prob, geom, jnp.float32, slab_rows=64, sweeps_per_call=T,
        interpret=True,
    )
    fn = halo.make_sharded_relax(
        prob, geom, mesh, jnp.dtype("float32"), sweeps_per_exchange=T
    )
    s = pmesh.level_sharding(mesh, geom)
    for ns in (T, 2 * T + 1):  # full chunks + a remainder chunk
        got = np.asarray(
            fn(jax.device_put(v, s), jax.device_put(f, s), ns)
        )
        want = np.asarray(single(v, f, ns))
        np.testing.assert_array_equal(got, want, err_msg=f"ns={ns}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_fmg_129_matches_single_device():
    """129^3 end-to-end sharded FMG vs the unsharded solver — the
    largest multi-chip correctness artifact this environment can
    produce (VERDICT r3 #9): levels 0-2 shard across the 8-device
    mesh, everything below agglomerates/replicates.  Masked-block
    per-shard engine (the time-skew wavefront's interpret mode walks
    XE+2T sequential plane steps — prohibitively slow here; its
    correctness is pinned bitwise by
    test_sharded_timeskew_bitwise_in_tier).  Measured identical to the
    last bit (scripts/sharded_129_fmg.py, ~26 s)."""
    import os

    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2),
        max_cycles=2,
        tol=0.0,
        pad_axis0_to=8,
    )
    single = MultigridSolver(Poisson(3), 129, cfg)
    r_single = single.solve_to_tolerance()
    assert not r_single.diverged
    mesh = pmesh.make_mesh(8)
    os.environ["PDE_MG_SHARD_TIMESKEW"] = "0"
    try:
        sharded = MultigridSolver(Poisson(3), 129, cfg, mesh=mesh)
        shard_lvls = [
            l
            for l, g in enumerate(single.geoms)
            if not pmesh.level_sharding(mesh, g).is_fully_replicated
        ]
        assert len(shard_lvls) >= 3, shard_lvls
        r_sharded = sharded.solve_to_tolerance()
    finally:
        os.environ.pop("PDE_MG_SHARD_TIMESKEW", None)
    assert not r_sharded.diverged
    np.testing.assert_allclose(
        np.asarray(r_sharded.v),
        np.asarray(r_single.v),
        rtol=2e-5,
        atol=2e-6,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_timeskew_full_solve_matches_masked_block():
    """Full sharded FMG solve: time-skew engine == masked-block fallback
    (PDE_MG_SHARD_TIMESKEW=0) == close to the unsharded solver."""
    import importlib

    from pde_multigrid_tpu.parallel import halo

    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 1, 2, 2), max_cycles=2, tol=0.0
    )
    single = MultigridSolver(Poisson(3), 33, cfg).solve_to_tolerance()
    mesh = pmesh.make_mesh(8)
    res = {}
    import os

    for flag in ("1", "0"):
        os.environ["PDE_MG_SHARD_TIMESKEW"] = flag
        try:
            r = MultigridSolver(
                Poisson(3), 33, cfg, mesh=mesh
            ).solve_to_tolerance()
        finally:
            os.environ.pop("PDE_MG_SHARD_TIMESKEW", None)
        assert not r.diverged
        res[flag] = np.asarray(r.v)
        np.testing.assert_allclose(
            np.asarray(r.v), np.asarray(single.v), rtol=2e-5, atol=2e-6
        )

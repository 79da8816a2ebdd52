"""Roofline accounting for the multigrid kernels (SURVEY.md §7 L2).

The headline metric (BASELINE.json) is smoother DOF-updates/s/chip
against the memory roofline: every relaxation sweep must stream the
level's v (read+write) and f (read) through HBM once the level exceeds
VMEM, so

    bytes/update  =  dtype_size * (r_v + w_v + r_f) * stored / interior
    roofline updates/s  =  HBM_BW / bytes_per_update

For the double-buffered slab kernels the reads carry an ext/B halo
factor; VMEM-resident levels amortize HBM traffic over all nu sweeps of
a relax leg (bytes/update ~ 3/nu per point — effectively compute-bound).

`cycle_traffic_model` walks a cycle schedule and reports per-level
traffic, the model's aggregate bytes, and the implied roofline time at a
given bandwidth, so measured per-step times translate into a
percent-of-roofline figure (bench.py --roofline).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

# v5e nominal HBM bandwidth; override per chip generation when known.
DEFAULT_HBM_GBPS = 819.0

# v5e VPU peak: 4 ALUs x (8 x 128) lanes x the TensorCore clock.  The
# clock is DERIVED from the published v5e peak — 197 bf16 TFLOP/s over
# 4 MXUs of 128x128 at 2 flops/MAC: 197e12 / (4*128*128*2) = 1.5 GHz —
# because the previous ~940 MHz guess understated the silicon and let
# BENCH_r04's 129^3 row read 116.6% of its "bound" (VERDICT r4 weak #3:
# a bound a kernel can beat devalues every percentage in the artifact).
# This is a CEILING, deliberately: the shared pool's effective device
# speed varies several-fold between windows (CLAUDE.md measurement
# protocol), so only a spec-derived ceiling is window-invariant.  A
# same-window streaming microbenchmark (scripts/probe_vpu_peak.py,
# 2026-08-21: ~8.7e11 VMEM-streamed elementwise adds/s, flat across
# 1..8 independent accumulator chains) shows typical windows run far
# below it — percent-of-roofline figures are conservative.
# Used for the compute-roofline view: once a relax leg runs ALL sweeps
# VMEM-resident (ops/pallas/defect.py resident inner), its cost is VPU
# arithmetic, not HBM traffic.
VPU_F32_OPS_PER_S = 4 * 8 * 128 * 1.5e9

# estimated VPU ops per interior point update in the color-split
# resident kernels, by problem dimension — audited against the actual
# sweep bodies (3D: make_split_resident_sweeps per color phase — window
# cast ~1.25, x-adds 1, y 2 rolls+select+add, z 2 rolls+add, rhs cast 1,
# folded local solve ~3, masked select 1, store cast 1 ~= 15-17; kept at
# 20 as a deliberate margin for the rolls' true instruction cost).  The
# fastest pool windows measured ~2.2e11 updates/s at 129^3 = ~4.5e12
# op-units/s, 73% of the spec ceiling above — consistent.
SPLIT_OPS_PER_UPDATE = {3: 20, 2: 14, 1: 8}


def vpu_bound_updates_per_s(
    ndim: int, stencil_k: int | None = None, line: bool = False
) -> float:
    """VPU-arithmetic-bound smoother updates/s for VMEM-resident sweeps.

    stencil_k: implicit-stencil (Galerkin) levels run the dense
    two-pass gs kernel — per color pass, (K-1) multiply-subtract pairs
    + a ~7-op divide + a 3-op masked blend, with both colors computed
    everywhere: ops/update ~ 2*(2*(K-1) + 10).

    line: zebra line relaxation (batched Thomas along the major axis) —
    per zebra half, the RHS build is 2(d-1) FMAs + a blend computed on
    the FULL grid, the forward scan is ~3 ops/point (dp recurrence; the
    cp recurrence is per-row scalar work), the backward ~2, the final
    blend ~3: ops/update ~ 2*(2(d-1) + 3 + 3 + 2 + 3)."""
    if line:
        return VPU_F32_OPS_PER_S / (2 * (2 * (ndim - 1) + 11))
    if stencil_k is not None:
        return VPU_F32_OPS_PER_S / (2 * (2 * (stencil_k - 1) + 10))
    return VPU_F32_OPS_PER_S / SPLIT_OPS_PER_UPDATE.get(ndim, 20)


@dataclasses.dataclass
class LevelTraffic:
    level: int
    stored_points: int
    interior_points: int
    resident: bool
    bytes_per_sweep: float  # HBM bytes per full red-black sweep
    sweeps: int

    @property
    def bytes_total(self) -> float:
        return self.bytes_per_sweep * self.sweeps


def _stored_points(shape: Sequence[int]) -> int:
    out = 1
    for n in shape:
        out *= n
    return out


def _interior_points(logical_shape: Sequence[int]) -> int:
    out = 1
    for n in logical_shape:
        out *= max(n - 2, 1)
    return out


def _timeskew_params(shape, split_caps: bool):
    """3D-wrap time-skew engagement for the traffic model: delegates to
    the SAME relax.timeskew_plan that plan_relax uses (ADVICE r3: the
    gates/ladder used to be hand-duplicated here and could silently
    desynchronize from the tier that actually runs).  Returns
    (T, halo_factor) when a time-skew tier engages, else None."""
    from pde_multigrid_tpu.ops.pallas import relax as _relax

    if not split_caps:
        return None
    ts = _relax.timeskew_plan(tuple(shape))
    if ts is None:
        return None
    if ts[0] == "full":
        return ts[1], ts[2]
    return ts[1], ts[3]


def relax_traffic(
    geom,
    sweeps: int,
    dtype_size: int = 4,
    resident_budget: int = 9 * 2**20,
    slab_halo_rows: int = 4,
    slab_block_rows: int = 16,
    f_zero: bool = False,
    split_caps: bool = True,
    stencil_k: int | None = None,
    line_smoother: bool = False,
) -> LevelTraffic:
    """HBM-traffic model of one relax leg at one level.

    Resident levels (fit in VMEM): one read of v and f plus one write of
    v per LEG regardless of nu.  Slab levels: per sweep, v and f are read
    with the trapezoidal halo factor (B + halo)/B and v is written once.
    f_zero: the RHS stream is statically dropped (relax.py f_zero path).
    split_caps: the problem supplies split_update/split_update2d, so the
    color-split tiers (time-skew, split-2D) are eligible — the traffic
    figures mirror plan_relax's engagement gates, falling back to the
    slab figure when a tier does not engage (jnp-only problems like HJB
    pass split_caps=False and get the dense-slab figure everywhere).
    """
    stored = _stored_points(geom.padded_shape)
    arr_bytes = stored * dtype_size
    resident = arr_bytes * 7 <= resident_budget
    n_reads = 1 if f_zero else 2
    shape = tuple(geom.padded_shape)
    if line_smoother:
        # zebra line relaxation (stencil.relax_zebra_line, jnp tier):
        # per zebra half — RHS build (read v, f; write d), forward scan
        # (read d, write the stacked dp), backward scan (read dp, write
        # x), blend (read v, write v): ~6 array passes per half, 12 per
        # sweep, resident levels excluded (the scan stacks through HBM).
        return LevelTraffic(
            level=-1,
            stored_points=stored,
            interior_points=_interior_points(geom.shape),
            resident=False,
            bytes_per_sweep=12 * arr_bytes,
            sweeps=sweeps,
        )
    if stencil_k is not None:
        # implicit-stencil (Galerkin/varcoef) levels: K coefficient
        # fields ride every stream.  Mirror plan_stencil_relax's tier
        # selection (ops/pallas/stencilop.py).
        from pde_multigrid_tpu.ops.pallas import relax as _relax
        from pde_multigrid_tpu.ops.pallas import stencilop as _sop

        K = stencil_k
        res_st = (
            _relax.tile_padded_bytes(shape if len(shape) > 1 else (1,) + shape)
            * (K + 8)
            <= _relax.RESIDENT_VMEM_BUDGET
        )
        if res_st:
            # one round trip of v, f, K coeffs, 2 masks in + v out
            per_sweep = (K + 5) * arr_bytes / max(sweeps, 1)
        else:
            plan = (
                _sop.stencil_slab2d_params(shape, shape[0] - 2, K)
                if len(shape) == 2
                else None
            )
            if plan is not None:
                Bs, Ts, exts = plan
                per_sweep = (
                    arr_bytes * ((K + 2) * exts / Bs + 1) / Ts
                )
            else:
                # jnp tier: v, f, K coeffs re-read per color pass + 2
                # whole-array writes per sweep
                per_sweep = (2 * (K + 2) + 2) * arr_bytes
        return LevelTraffic(
            level=-1,
            stored_points=stored,
            interior_points=_interior_points(geom.shape),
            resident=res_st,
            bytes_per_sweep=per_sweep,
            sweeps=sweeps,
        )
    ts = (
        _timeskew_params(shape, split_caps)
        if (not resident and getattr(geom, "wrap", False) and geom.ndim == 3)
        else None
    )
    if resident:
        per_leg = (n_reads + 1) * arr_bytes  # reads + write v, whole leg
        per_sweep = per_leg / max(sweeps, 1)
    elif ts is not None:
        # time-skewed wavefront tiers (relax.make_split_timeskew_relax
        # / _jb): 10 B/point per T-sweep chunk (read black+fr+fb, write
        # r+b); the j-blocked variant reads with an ext_j/Bj halo factor.
        T, halo_f = ts
        chunks = -(-max(sweeps, 1) // T)
        per_chunk = arr_bytes * (1.5 * halo_f + 1.0)
        per_sweep = per_chunk * chunks / max(sweeps, 1)
    elif geom.ndim == 2:
        from pde_multigrid_tpu.ops.pallas import relax as _relax

        plan2d = (
            _relax.split2d_plan(tuple(shape), (+1,))
            if (
                split_caps
                and not getattr(geom, "wrap", False)
                and shape[1] % 2 == 0
                and shape[0] % 8 == 0
                and shape[1] // 2 >= _relax.SPLIT2D_MIN_Y2
            )
            else None
        )
        if plan2d is not None:
            # 2D color-split slab (relax.make_split_color_slab_2d):
            # T sweeps per HBM round trip with an ext/B one-sided halo
            # read factor, from the SAME ladder plan_relax uses
            B2, T2, ext2 = plan2d
            per_sweep = (
                arr_bytes * (n_reads * ext2 / B2 + 1) / T2
            )
        else:
            # dense 2D slab (make_slab_relax, T=4, 8-row halos, B=64)
            per_sweep = arr_bytes * (n_reads * 80.0 / 64.0 + 1) / 4
    else:
        halo_f = (slab_block_rows + slab_halo_rows) / slab_block_rows
        per_sweep = arr_bytes * (n_reads * halo_f + 1)
    return LevelTraffic(
        level=-1,
        stored_points=stored,
        interior_points=_interior_points(geom.shape),
        resident=resident,
        bytes_per_sweep=per_sweep,
        sweeps=sweeps,
    )


def cycle_traffic_model(
    geoms,
    kind: str,
    nu0: int,
    nu1: int,
    nu2: int,
    mu: int = 1,
    dtype_size: int = 4,
    precision: str = "f32",
    rhs_zero: bool = False,
    split_caps: bool = True,
    stencil_k: int | None = None,
    line_smoother: bool = False,
):
    """Per-level relax-leg counts and traffic for a V/FMG schedule (the
    transfer ops add one ~3-array pass per instance — folded in as a
    flat 10% overhead rather than op-by-op accounting).

    precision="mixed": slab-tier sweeps stream bf16 error/residual halves
    (half the per-sweep bytes) plus ~5 f32 array passes per relax leg for
    the residual-split and merge-fold kernels (ops/pallas/defect.py).

    rhs_zero: the problem's RHS is identically zero, so RHS-carrying legs
    (cycle roots) drop the f stream (cycles.CycleProgram f_zero)."""
    nlev = len(geoms)
    legs = [0] * nlev
    legs_f0 = [0] * nlev  # RHS-carrying legs of rhs_zero problems

    def v_cycle(l, f_is_rhs):
        legs[l] += 2  # nu1 + nu2 legs
        if rhs_zero and f_is_rhs:
            legs_f0[l] += 2
        if l < nlev - 1:
            for _ in range(mu):
                v_cycle(l + 1, False)

    if kind in ("v", "w"):
        v_cycle(0, True)
    elif kind == "fmg":
        for root in range(nlev):
            for _ in range(nu0):
                v_cycle(root, True)
    else:
        raise ValueError(kind)

    rows = []
    total_bytes = 0.0
    total_updates = 0.0
    for l, g in enumerate(geoms):
        nu = (nu1 + nu2) // 2 or 1

        def leg_traffic(n_legs, f_zero):
            from pde_multigrid_tpu.ops.pallas import defect as _defect

            t = relax_traffic(
                g, nu, dtype_size, f_zero=f_zero, split_caps=split_caps,
                stencil_k=stencil_k, line_smoother=line_smoother,
            )
            t = dataclasses.replace(t, level=l, sweeps=n_legs * nu)
            if (
                precision == "mixed"
                and not t.resident
                and nu >= _defect.RESIDENT_MIN_SWEEPS
            ):
                # defect-correction leg: four bf16 color-split halves
                # (one field's two halves = stored points x 2 bytes)
                halves_bytes = t.stored_points * 2
                if 2 * halves_bytes <= _defect.RESIDENT_DEFECT_BUDGET:
                    # ALL-sweeps-resident inner (defect.py): per LEG,
                    # rsplit reads v[+f] and writes the residual halves,
                    # the inner reads them and writes the error halves,
                    # fold reads those plus v and writes v — nu-free.
                    n_rd = 2 if f_zero else 3
                    per_leg = (
                        (n_rd + 1) * t.stored_points * dtype_size
                        + 4 * halves_bytes
                    )
                    t = dataclasses.replace(
                        t, bytes_per_sweep=per_leg / nu, resident=True
                    )
                # (levels whose halves bust VMEM run the f32 time-skew
                # tier — relax_traffic already models it)
            return t

        t0 = leg_traffic(legs_f0[l], True)
        t = leg_traffic(legs[l] - legs_f0[l], False)
        t = dataclasses.replace(
            t,
            sweeps=t.sweeps + t0.sweeps,
            bytes_per_sweep=(
                (
                    t.bytes_per_sweep * t.sweeps
                    + t0.bytes_per_sweep * t0.sweeps
                )
                / max(t.sweeps + t0.sweeps, 1)
            ),
        )
        rows.append(t)
        total_bytes += t.bytes_total
        total_updates += t.interior_points * t.sweeps
    total_bytes *= 1.10  # transfer-op overhead
    return rows, total_bytes, total_updates


def percent_of_roofline(
    measured_seconds: float,
    model_bytes: float,
    hbm_gbps: float = DEFAULT_HBM_GBPS,
) -> float:
    """Measured step time vs the HBM-bandwidth-bound model time."""
    t_model = model_bytes / (hbm_gbps * 1e9)
    return 100.0 * t_model / max(measured_seconds, 1e-12)

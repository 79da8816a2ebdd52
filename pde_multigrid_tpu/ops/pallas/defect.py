"""Mixed-precision defect-correction relaxation (f32 state, bf16 sweeps).

The relaxation sweeps at HBM-resident levels are memory-bound: the split
slab kernel (ops/pallas/relax.py) already sits at the f32 read roofline,
so the only remaining 2x is the word size.  Storing the ITERATE in bf16
is not acceptable — the solution would be limited to ~3 decimal digits,
far above discretization accuracy — but any linear stationary smoother
applied to the *error equation* is algebraically identical to applying
it to the iterate directly:

    v_nu = S^nu(v_0; f)  ==  v_0 + E_nu   where   E_nu = S^nu(0; r_0),
    r_0 = f - A v_0

(both sides equal v* + M^nu (v_0 - v*) for the smoother's iteration
matrix M).  The error E and residual r_0 shrink with convergence, so
carrying THEM in bf16 perturbs each relax leg by only ~0.4% of the
current error — the iterate stays f32 and the solver converges to the
same f32 fixed point (tests/test_mixed.py asserts this end-to-end).

Per nu-sweep leg this replaces nu f32 sweeps (12 B/point each in split
storage) with:

    1. residual+split+cast: one fused f32 pass emitting the bf16
       color-split residual halves (make_residual_split),
    2. nu bf16 sweeps of the error equation at 6 B/point
       (relax.make_split_slab_relax with dtype=bf16, raw color-split IO),
    3. merge+fold: one fused pass adding the bf16 error halves into the
       f32 iterate (make_merge_fold; the accumulation is f32).

Net ~2x HBM-traffic cut for nu >> 8 (MIXED_MIN_SWEEPS gates small legs).
Reference precision context: the reference is float32 throughout
(SURVEY.md §2.7.9) and its GPU lacks fast reduced precision; this layer
is a TPU-native extension that preserves the f32 results.

The color-split convention matches relax._split_qmask: with
q = (x + z) % 2, red points of row (x, z) sit at y = 2j + q.  The y
extraction/interleave runs as MXU dots with 0/1 pick matrices (strided
sublane slices are unsupported in Mosaic); picks of bf16 values with f32
accumulation are exact, and the fold is computed in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from pde_multigrid_tpu.grid import LevelGeometry
from pde_multigrid_tpu.ops.pallas import relax as relax_mod

# bf16 defect smoothing engages only when the leg's sweep savings cover
# the per-leg fixed work (residual-split, fold, zero init).  MEASURED
# breakeven on v5e is ~20 sweeps/leg (at 257^3 FMG nu=20 the defect path
# was a wash end-to-end), so gate well above it.
MIXED_MIN_SWEEPS = 32

# trapezoidal sweeps per HBM round trip for the bf16 inner smoother —
# independent of the f32 kernels' SPLIT_SWEEPS_PER_CALL: halving the
# word size doubles the compute share, so the traffic/redundant-halo
# trade sits elsewhere (A/B'd on hardware, scripts/ab_mixed.py)
DEFECT_T = 1

# OFF by default: at 257^3 the bf16 2D-blocked inner needs a 16-row j
# halo (bf16 sublane DMA alignment) on VMEM-capped 16-row-owned blocks —
# 3x redundant compute vs the f32 kernel's 1.5x, measured 14 ms/step
# SLOWER end-to-end.  257^3-class levels therefore smooth in f32 at L0
# while their 128^3-class coarse levels still take the full-plane
# defect path.
DEFECT_2D = False

DEFECT_VMEM_BUDGET = 12 * 2**20

# VMEM ceiling for the ALL-sweeps-resident inner smoother (the four bf16
# halves + one f32 block window's temps must fit under the ~16 MB core
# VMEM); 129^3-class levels cost ~8.5 MB resident + ~5.9 MB of B=16
# window temps = 14.4 MB — hardware-validated (compiles and runs), and
# B=16 measured ~7% faster sweeps than B=8 (median 9.76 vs 10.51
# us/sweep over 6 interleaved rounds; smaller window-load redundancy)
RESIDENT_DEFECT_BUDGET = 14 * 2**20 + 2**19

# ceiling for the f32-ITERATE resident variant (error halves f32 = no
# pack/unpack casts in the sweep body; residual halves stay bf16):
# 129^3-class = ~12.7 MB resident, leaving room only for B=4 windows.
# OFF by default — hardware A/B (scripts/ab_resident_f32.py and the
# full-step scripts/ab_defect_resident.py, 2026-08-19): the f32 iterate
# is ~15% SLOWER per sweep than bf16 (7.69 vs 6.63 ms/step against a
# 9.30 ms chunked control) — the sweeps are VMEM-load-bandwidth-bound,
# so halving the iterate word beats removing the pack/unpack casts.
# Its residual does track the pure-f32 path ~20x tighter (8.9e-5 vs
# 1.8e-3 rel), so PDE_MG_DEFECT_RESIDENT_F32=1 remains available.
RESIDENT_F32_BUDGET = 15 * 2**20

# per-leg sweep threshold for the resident inner: its fixed cost is one
# bf16 round trip of the halves (~4 B/point) on top of the rsplit/fold
# passes, vs the f32 slab kernel's ~12 B/point/sweep — breakeven ~2
# sweeps, gated a little above
RESIDENT_MIN_SWEEPS = 4


def _rows(X, Y, Z, per_row_bytes, budget=DEFECT_VMEM_BUDGET):
    for B in (8, 4, 2):
        if X % B == 0 and X // B >= 2 and per_row_bytes * B <= budget:
            return B
    return None


def make_residual_split(
    problem, geom: LevelGeometry, dtype, out_dtype, interpret=False
):
    """Fused kernel: (r_red, r_black) = split(cast(m_int * (f - L v))).

    One f32 read of (v, f) per call; emits the color-split residual
    halves directly in `out_dtype` (bf16), saving the dense-r round trip
    a separate residual + split would pay.  x-neighbors arrive via
    modulo BlockSpec maps exactly as in transfer.make_residual (the wrap
    read of x = X-1 -> 0 lands on the stored zero boundary plane)."""
    if not (geom.wrap and geom.ndim == 3):
        return None
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    if Z % 128 or Y % 8 or Y2 % 16 or not hasattr(problem, "kernel_operator"):
        return None
    # VMEM per row: 4 f32 (Y,Z) blocks in/ext + 2 bf16 (Y2,Z) out + temps
    B = _rows(X, Y, Z, Y * Z * 4 * 14)
    if B is None:
        return None
    nblk = X // B
    # stacked transposed picks: rows [0, Y2) extract even y, [Y2, 2Y2) odd
    pt = np.zeros((2 * Y2, Y), np.float32)
    pt[np.arange(Y2), 2 * np.arange(Y2)] = 1.0
    pt[Y2 + np.arange(Y2), 2 * np.arange(Y2) + 1] = 1.0
    pt = jnp.asarray(pt, out_dtype)

    def kernel(vm_ref, v_ref, vp_ref, f_ref, pt_ref, r_ref, b_ref):
        ext = jnp.concatenate(
            [vm_ref[B - 1 : B], v_ref[:], vp_ref[0:1]], axis=0
        )

        def roll(a, ax, off):
            return jnp.roll(a, -off, axis=ax)

        Lv = problem.kernel_operator(ext, geom, roll)[1 : B + 1]
        x0 = pl.program_id(0) * B
        gx = x0 + lax.broadcasted_iota(jnp.int32, (B, Y, Z), 0)
        gy = lax.broadcasted_iota(jnp.int32, (B, Y, Z), 1)
        gz = lax.broadcasted_iota(jnp.int32, (B, Y, Z), 2)
        m = ((gx >= 1) & (gy >= 1) & (gz >= 1)).astype(dtype)
        r16 = (m * (f_ref[:] - Lv)).astype(out_dtype)
        # one BATCHED pick-dot over the whole block (a per-row dot loop
        # is MXU-latency-bound); picks of bf16 values, f32-accumulated:
        # exact
        s = jnp.einsum(
            "ky,byz->bkz",
            pt_ref[:],
            r16,
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        bx = lax.broadcasted_iota(jnp.int32, (B, 1, Z), 0) + x0
        bz = lax.broadcasted_iota(jnp.int32, (B, 1, Z), 2)
        q1 = ((bx + bz) % 2) == 1
        r_ref[:] = jnp.where(q1, s[:, Y2:], s[:, :Y2])
        b_ref[:] = jnp.where(q1, s[:, :Y2], s[:, Y2:])

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((B, Y, Z), lambda i: ((i - 1) % nblk, 0, 0)),
            pl.BlockSpec((B, Y, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, Y, Z), lambda i: ((i + 1) % nblk, 0, 0)),
            pl.BlockSpec((B, Y, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * Y2, Y), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, Y2, Z), out_dtype),
            jax.ShapeDtypeStruct((X, Y2, Z), out_dtype),
        ),
        interpret=interpret,
    )
    return lambda v, f: call(v, v, v, f, pt)


def make_merge_fold(
    geom: LevelGeometry, in_dtype, dtype, interpret=False
):
    """Fused kernel: v' = v + merge(e_red, e_black).

    Reads the bf16 color-split error halves and the f32 iterate, writes
    the folded f32 iterate: the interleave is an exact pick-dot widen of
    the bf16 values and the add runs in f32."""
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    assert Z % 128 == 0 and Y % 8 == 0 and Y2 % 16 == 0
    B = _rows(X, Y, Z, Y * Z * 4 * 10)
    if B is None:
        return None
    nblk = X // B
    u = np.zeros((Y, 2 * Y2), np.float32)
    u[2 * np.arange(Y2), np.arange(Y2)] = 1.0
    u[2 * np.arange(Y2) + 1, Y2 + np.arange(Y2)] = 1.0
    u = jnp.asarray(u, in_dtype)

    def kernel(r_ref, b_ref, v_ref, u_ref, o_ref):
        x0 = pl.program_id(0) * B
        bx = lax.broadcasted_iota(jnp.int32, (B, 1, Z), 0) + x0
        bz = lax.broadcasted_iota(jnp.int32, (B, 1, Z), 2)
        q1 = ((bx + bz) % 2) == 1
        r, b = r_ref[:], b_ref[:]
        s = jnp.concatenate(
            [jnp.where(q1, b, r), jnp.where(q1, r, b)], axis=1
        )
        # one batched interleave-dot: exact widen of bf16 values with
        # f32 accumulation; the fold add runs in f32
        e = jnp.einsum(
            "yk,bkz->byz", u_ref[:], s, preferred_element_type=jnp.float32
        )
        o_ref[:] = v_ref[:] + e.astype(dtype)

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, Y2, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, Y, Z), lambda i: (i, 0, 0)),
            pl.BlockSpec((Y, 2 * Y2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, Y, Z), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), dtype),
        interpret=interpret,
    )
    return lambda r, b, v: call(r, b, v, u)


def plan_defect_relax(
    problem,
    geom: LevelGeometry,
    dtype,
    interpret=False,
    inner_dtype=jnp.bfloat16,
):
    """relax(v, f, nsweeps) via bf16 defect-correction, or None.

    Engages only where the f32 planner would pick a slab kernel (VMEM-
    resident levels do all sweeps in one HBM round trip already — defect
    correction would only ADD the residual/fold passes there)."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return None
    if not (
        geom.wrap
        and geom.ndim == 3
        and hasattr(problem, "split_update")
        and hasattr(problem, "kernel_operator")
    ):
        return None
    X, Y, Z = geom.padded_shape
    Y2 = Y // 2
    if Z % 128 or Y % 8 or Y2 % 16 or X % 2:
        return None
    # slab-tier levels only (mirrors plan_relax's resident gate, including
    # the merged-resident path for sub-lane Z — excluded here via Z % 128)
    if (
        relax_mod.tile_padded_bytes(geom.padded_shape) * 7
        <= relax_mod.RESIDENT_VMEM_BUDGET
    ):
        return None
    # the inner smoother stores bf16 but computes f32 (measured on v5e:
    # bf16 elementwise arithmetic is ~2x slower per op than f32, which
    # erased the traffic win) — so the VMEM cost model is the f32
    # kernel's (the sweep temps are f32), and the bf16 buffers come on
    # top at half an f32 array each.
    import os

    T = DEFECT_T
    half_plane = Y2 * Z * 4
    inner = None
    # ALL-sweeps-resident inner: the four bf16 halves live in VMEM for
    # the whole leg (one HBM round trip per leg, any nu).  Preferred
    # whenever they fit; PDE_MG_DEFECT_RESIDENT=0 falls back to the
    # T-chunked slab inner below.
    if os.environ.get("PDE_MG_DEFECT_RESIDENT", "1") == "1":
        isz = jnp.dtype(inner_dtype).itemsize
        force_b = int(os.environ.get("PDE_MG_DEFECT_RESIDENT_B", "0"))
        # preferred: f32 iterate halves (cast-free sweep body); fall back
        # to inner_dtype (bf16) iterate when VMEM says no.
        cands = []
        if os.environ.get("PDE_MG_DEFECT_RESIDENT_F32", "0") == "1":
            cands.append((jnp.float32, RESIDENT_F32_BUDGET))
        cands.append((inner_dtype, RESIDENT_DEFECT_BUDGET))
        for idt, budget in cands:
            ii = jnp.dtype(idt).itemsize
            res_bytes = (
                relax_mod.tile_padded_bytes((X + 2, Y2, Z), ii) * 2
                + relax_mod.tile_padded_bytes((X, Y2, Z), isz) * 2
            )
            for B in ((force_b,) if force_b else (16, 8, 4)):
                if X % B or B % 2:
                    continue
                temps = relax_mod.tile_padded_bytes((B + 2, Y2, Z), 4) * 10
                if res_bytes + temps <= budget:
                    inner = relax_mod.make_split_resident_sweeps(
                        problem,
                        geom,
                        inner_dtype,
                        B,
                        interpret=interpret,
                        compute_dtype=jnp.float32,
                        iterate_dtype=idt,
                    )
                    break
            if inner is not None:
                break
    if inner is None:
        for B in (16, 8, 4):
            ext = B + 4 * T
            if X < ext or X % B:
                continue
            if half_plane * 14 * (ext + 1) <= relax_mod.SLAB_VMEM_BUDGET:
                inner = relax_mod.make_split_slab_relax(
                    problem,
                    geom,
                    inner_dtype,
                    B,
                    sweeps_per_call=T,
                    interpret=interpret,
                    raw=True,
                    compute_dtype=jnp.float32,
                )
                break
    if inner is None and DEFECT_2D:
        # 2D-blocked tier (whole half-planes bust VMEM: 257^3 and up).
        # bf16 storage needs 16-aligned j blocks/halos; the VMEM model
        # stays f32-costed (the sweep temps are f32 compute copies).
        for B in (8, 4):
            ext = B + 4 * T
            if X % B or X < ext or (X - ext) % 2:
                continue
            for Bj in (64, 32, 16):
                if Y2 % Bj or Y2 < Bj + 32 or Bj % 16:
                    continue
                unit = relax_mod.tile_padded_bytes(
                    (ext + 1, Bj + 33, Z)
                )
                if unit * 14 <= relax_mod.SLAB_VMEM_BUDGET:
                    inner = relax_mod.make_split_slab_relax_2d(
                        problem,
                        geom,
                        inner_dtype,
                        B,
                        Bj,
                        sweeps_per_call=T,
                        interpret=interpret,
                        raw=True,
                        compute_dtype=jnp.float32,
                    )
                    break
            if inner is not None:
                break
    if inner is None:
        return None
    rsplit = make_residual_split(
        problem, geom, dtype, inner_dtype, interpret
    )
    fold = make_merge_fold(
        geom, getattr(inner, "out_dtype", inner_dtype), dtype, interpret
    )
    if rsplit is None or fold is None:
        return None
    zero = functools.partial(jnp.zeros, (X, Y2, Z), inner_dtype)
    # in-kernel zero-start first chunk: ON by default — hardware-validated
    # (scripts/ab_defect_vzero.py: residual bitwise-identical to the
    # materialized-zeros path, per-step time at parity; interpret-mode
    # equivalence in tests/test_mixed.py).  PDE_MG_DEFECT_VZERO=0 disables
    # (the resident inner has no materialized-zeros form: always in-kernel).
    in_kernel_zero = getattr(inner, "supports_v_zero", False) and (
        getattr(inner, "resident", False)
        or os.environ.get("PDE_MG_DEFECT_VZERO", "1") == "1"
    )

    def relax(v, f, nsweeps: int):
        rr, rb = rsplit(v, f)
        if in_kernel_zero:
            # E_0 = 0 statically: the first chunk runs without the error
            # halves' HBM streams (no materialized zero arrays either)
            er, eb = inner(None, None, rr, rb, nsweeps, v_zero=True)
        else:
            er, eb = inner(zero(), zero(), rr, rb, nsweeps)
        return fold(er, eb, v)

    # per-leg engagement threshold (dispatch.PallasKernels.relax): the
    # resident inner amortizes at a few sweeps; the chunked one needs
    # its fixed passes covered by the per-sweep traffic savings
    relax.min_sweeps = (
        RESIDENT_MIN_SWEEPS
        if getattr(inner, "resident", False)
        else MIXED_MIN_SWEEPS
    )
    return relax

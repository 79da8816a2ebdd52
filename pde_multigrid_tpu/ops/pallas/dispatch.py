"""Select Pallas kernels for a (problem, geometry) pair.

Returns a `PallasKernels` (subclass of the jnp tier that overrides the hot
relaxation path with fused kernels per level) or None when no fused kernel
covers the problem — callers fall back to cycles.JnpKernels.

On non-TPU backends (unit tests on the CPU mesh) the kernels run in Pallas
interpreter mode so the same code path is exercised everywhere.
"""

from __future__ import annotations

import jax

from pde_multigrid_tpu.cycles import JnpKernels
from pde_multigrid_tpu.ops.pallas import relax as relax_mod
from pde_multigrid_tpu.ops.pallas import transfer as transfer_mod


class PallasKernels(JnpKernels):
    """jnp tier with per-level fused Pallas relaxation and fused
    inter-grid transfer kernels (residual+restrict, prolong+blend)."""

    def __init__(
        self,
        problem,
        geoms,
        dtype,
        interpret: bool,
        cycle=None,
        mixed: bool = False,
    ):
        super().__init__(problem, geoms)
        self._relax_fns = [
            relax_mod.plan_relax(problem, g, dtype, interpret=interpret)
            for g in geoms
        ]
        # mixed precision: bf16 defect-correction smoothing for the
        # HBM-bound (slab-tier) levels; engages per relax leg when the
        # sweep count amortizes the extra f32 residual/fold passes
        self._defect_fns = [None] * len(geoms)
        if mixed:
            from pde_multigrid_tpu.ops.pallas import defect as defect_mod

            self._defect_fns = [
                defect_mod.plan_defect_relax(
                    problem, g, dtype, interpret=interpret
                )
                for g in geoms
            ]
        from pde_multigrid_tpu.ops.pallas import subtree as subtree_mod

        self._sub_v, self._sub_c = subtree_mod.plan_fused_cycles(
            problem, geoms, dtype, cycle, interpret=interpret
        )
        # persistent color-split tier for big non-wrap 2D levels
        # (VERDICT r4 #1): relax legs consume/produce halves directly;
        # the dense<->split correspondence is cached per trace and XLA
        # dead-code-eliminates every merge whose dense twin is never
        # consumed.  residual+restrict and prolong+blend run in half
        # layout too (ops/split2d.py) when the problem supplies
        # split_operator2d, so a level visit converts NOTHING.
        # Keep-mask problems are excluded (the split-layout masks here
        # are the pure geometric interior).
        import os as _os

        self._dtype = dtype
        n_geoms = len(geoms)
        self._split_raw = [None] * n_geoms
        self._split_ops = False
        if (
            _os.environ.get("PDE_MG_SPLIT2D_PERSIST", "1") == "1"
            and not hasattr(problem, "kernel_keep_mask")
        ):
            self._split_raw = [
                relax_mod.plan_split2d_raw(
                    problem, g, dtype, interpret=interpret
                )
                for g in geoms
            ]
            self._split_ops = hasattr(problem, "split_operator2d")
        self._split_cache = {}
        self._fsplit_cache = {}
        n = len(geoms)
        self._rr = [None] * n
        self._restrict = [None] * n
        self._pb = [{} for _ in range(n)]
        # XLA-level MXU pick-matrix transfers for big wrap-3D pairs the
        # fused kernels' VMEM stack rejects (512^3+: the jnp tier's
        # reshape-split subsample relayouts cost 26.8 ms/restrict there
        # — VERDICT r3 #6)
        self._xla_restrict = [None] * n
        self._xla_prolong = [None] * n
        self._res = [
            transfer_mod.make_residual(problem, g, dtype, interpret=interpret)
            for g in geoms
        ]
        for l in range(n - 1):
            gf, gc = geoms[l], geoms[l + 1]
            if not transfer_mod.planner_ok(gf, gc):
                # sub-lane pairs: small resident transfer kernels (the
                # XLA strided-gather fallbacks cost ~fixed ms per launch
                # and FMG's f-cascade/upward leg runs one per level)
                self._restrict[l] = subtree_mod.make_small_restrict(
                    gf, gc, dtype, interpret=interpret
                )
                for mode in ("add", "replace"):
                    self._pb[l][mode] = (
                        subtree_mod.make_small_prolong_blend(
                            gc, gf, dtype, mode, interpret=interpret
                        )
                    )
                if self._restrict[l] is None and transfer_mod.xla_pair_ok(
                    gf, gc
                ):
                    self._xla_restrict[l] = transfer_mod.make_xla_restrict(
                        gf, gc, dtype
                    )
                    self._xla_prolong[l] = transfer_mod.make_xla_prolong(
                        gc, gf, dtype
                    )
                elif self._restrict[l] is None and (
                    transfer_mod.xla_pair_ok_2d(gf, gc)
                ):
                    # big non-wrap 2D pairs: MXU pick-matrix transfers
                    # (the jnp tier's lane-dim relayouts dominated the
                    # 2D per-step fixed cost — VERDICT r4 #2).  Edge
                    # injection is exact iff m_int is purely geometric
                    # (no keep-mask problems like HJB's pinned ball).
                    self._xla_restrict[l] = (
                        transfer_mod.make_xla_restrict_2d(
                            gf, gc, dtype,
                            edge_injection=not hasattr(
                                problem, "kernel_keep_mask"
                            ),
                        )
                    )
                    self._xla_prolong[l] = (
                        transfer_mod.make_xla_prolong_2d(gc, gf, dtype)
                    )
                continue
            self._rr[l] = transfer_mod.make_residual_restrict(
                problem, gf, gc, dtype, interpret=interpret
            )
            self._restrict[l] = transfer_mod.make_residual_restrict(
                problem, gf, gc, dtype, interpret=interpret,
                with_residual=False,
            )
            for mode in ("add", "replace"):
                self._pb[l][mode] = transfer_mod.make_prolong_blend(
                    gc, gf, dtype, mode, interpret=interpret
                )

    # -- persistent color-split plumbing (trace-time caches) ---------------

    def _split_cached(self, cache, key, builder):
        """Trace-time memo keyed by tracer IDENTITY (the stored strong
        ref pins the id, so a recycled id can never alias)."""
        e = cache.get(id(key))
        if e is not None and e[0] is key:
            return e[1]
        val = builder()
        if len(cache) > 4096:
            cache.clear()
        cache[id(key)] = (key, val)
        return val

    def _to_split(self, l, v):
        return self._split_cached(
            self._split_cache, v, lambda: self._split_raw[l][1](v)
        )

    def _from_split(self, l, rb):
        v = self._split_raw[l][2](*rb)
        if len(self._split_cache) > 4096:
            self._split_cache.clear()
        self._split_cache[id(v)] = (v, rb)
        return v

    def _f_halves(self, l, f):
        return self._split_cached(
            self._fsplit_cache, f, lambda: self._split_raw[l][1](f)
        )

    def relax(self, l, v, f, aux, nsweeps, f_zero=False):
        sr = self._split_raw[l]
        if sr is not None and nsweeps > 0:
            fn, _, _ = sr
            rb = self._to_split(l, v)
            fs = (
                ()
                if f_zero and fn.supports_f_zero
                else self._f_halves(l, f)
            )
            return self._from_split(l, fn(rb[0], rb[1], fs, nsweeps))
        dfn = self._defect_fns[l]
        if dfn is not None and nsweeps >= getattr(
            dfn, "min_sweeps", _defect_min_sweeps()
        ):
            return dfn(v, f, nsweeps)
        fn = self._relax_fns[l]
        if fn is None:
            return super().relax(l, v, f, aux, nsweeps)
        if f_zero and getattr(fn, "supports_f_zero", False):
            return fn(v, f, nsweeps, f_zero=True)
        return fn(v, f, nsweeps)

    def residual(self, l, v, f, aux):
        fn = self._res[l]
        if fn is None:
            return super().residual(l, v, f, aux)
        return fn(v, v, v, f)

    def restrict(self, l_fine, arr, m_int_coarse, m_log_coarse):
        fn = self._xla_restrict[l_fine]
        if fn is not None:
            return fn(arr, m_int_coarse, m_log_coarse)
        return super().restrict(l_fine, arr, m_int_coarse, m_log_coarse)

    def prolong(self, l_fine, arr):
        fn = self._xla_prolong[l_fine]
        if fn is not None:
            return fn(arr)
        return super().prolong(l_fine, arr)

    # -- fused subtree hooks (cycles.CycleProgram consults these) ----------

    def fused_vcycle(self, l, v, f):
        """Complete V-cycle rooted at level l as one kernel, or None."""
        fn = self._sub_v[l]
        return None if fn is None else fn(v, f)

    def fused_correction(self, l, v, f):
        """Coarse-grid correction for level l (residual, restrict, the
        whole deeper V-cycle, prolong, correct) as one kernel, or None."""
        fn = self._sub_c[l]
        return None if fn is None else fn(v, f)

    # -- fused transfer hooks (cycles.CycleProgram consults these) ---------

    def residual_restrict(self, l, v, f, aux, coarse_aux, f_zero=False):
        if self._split_raw[l] is not None and self._split_ops:
            from pde_multigrid_tpu.ops import split2d

            rb = self._to_split(l, v)
            fr, fb = (
                (None, None) if f_zero else self._f_halves(l, f)
            )
            rr_h, rb_h = split2d.residual_halves(
                self.problem, self.geoms[l], rb[0], rb[1], fr, fb,
                self._dtype,
            )
            return split2d.restrict_residual_from_halves(
                self.geoms[l],
                self.geoms[l + 1],
                rr_h,
                rb_h,
                coarse_aux["m_int"],
                coarse_aux["m_log"],
            )
        fn = self._rr[l]
        return None if fn is None else fn(v, f)

    def restrict_direct(self, l, arr, coarse_aux):
        fn = self._restrict[l]
        return None if fn is None else fn(arr)

    def prolong_blend(self, l_fine, base_v, coarse_v, m_int, mode):
        if self._split_raw[l_fine] is not None and self._split_ops:
            from pde_multigrid_tpu.ops import split2d

            rb = self._to_split(l_fine, base_v)
            r2, b2 = split2d.prolong_blend_halves(
                self.geoms[l_fine + 1],
                self.geoms[l_fine],
                coarse_v,
                rb[0],
                rb[1],
                mode,
                self._dtype,
            )
            return self._from_split(l_fine, (r2, b2))
        fn = self._pb[l_fine].get(mode)
        return None if fn is None else fn(coarse_v, base_v)


def _defect_min_sweeps() -> int:
    from pde_multigrid_tpu.ops.pallas import defect as defect_mod

    return defect_mod.MIXED_MIN_SWEEPS


def is_tpu_backend() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in (dev.platform + " " + dev.device_kind).lower()


def make_kernels(
    problem, geoms, dtype=None, force=False, cycle=None, precision="f32"
):
    """Pallas kernel tier, or None.

    auto mode (force=False): only on real TPU backends — interpreter-mode
    Pallas on CPU is for tests, which request it explicitly via force.
    `cycle` (a CycleConfig) enables the fused coarse-subtree V-cycle
    kernels, which bake in (nu1, nu2, mu).  precision="mixed" enables
    bf16 defect-correction smoothing (ops/pallas/defect.py)."""
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or jnp.float32)
    if dtype != jnp.dtype("float32"):
        return None  # fused kernels are float32 (reference precision)
    on_tpu = is_tpu_backend()
    if not on_tpu and not force:
        return None
    k = PallasKernels(
        problem,
        geoms,
        dtype,
        interpret=not on_tpu,
        cycle=cycle,
        mixed=(precision == "mixed"),
    )
    if all(fn is None for fn in k._relax_fns):
        return None
    return k

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


class PallasKernels(JnpKernels):
    """jnp tier with per-level fused Pallas relaxation."""

    def __init__(self, problem, geoms, dtype, interpret: bool):
        super().__init__(problem, geoms)
        self._relax_fns = [
            relax_mod.plan_relax(problem, g, dtype, interpret=interpret)
            for g in geoms
        ]

    def relax(self, l, v, f, aux, nsweeps):
        fn = self._relax_fns[l]
        if fn is None:
            return super().relax(l, v, f, aux, nsweeps)
        return fn(v, f, nsweeps)


def is_tpu_backend() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in (dev.platform + " " + dev.device_kind).lower()


def make_kernels(problem, geoms, dtype=None, force=False):
    """Pallas kernel tier, or None.

    auto mode (force=False): only on real TPU backends — interpreter-mode
    Pallas on CPU is for tests, which request it explicitly via force."""
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype or jnp.float32)
    if dtype != jnp.dtype("float32"):
        return None  # fused kernels are float32 (reference precision)
    on_tpu = is_tpu_backend()
    if not on_tpu and not force:
        return None
    k = PallasKernels(problem, geoms, dtype, interpret=not on_tpu)
    if all(fn is None for fn in k._relax_fns):
        return None
    return k

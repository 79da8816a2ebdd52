"""Core multigrid operators.

`stencil` holds the jnp reference tier (dimension-generic, XLA-fused);
`pallas` holds the TPU-native fused kernels (the reference's CUDA-kernel
analogue, SURVEY.md §2.1 native-component note); `galerkin` the
implicit-stencil / Galerkin coarse-operator layer.
"""

from pde_multigrid_tpu.ops.stencil import (
    relax_rbgs,
    residual,
    restrict_full_weighting,
    prolong_linear,
    apply_correction,
    set_interior,
)

__all__ = [
    "relax_rbgs",
    "residual",
    "restrict_full_weighting",
    "prolong_linear",
    "apply_correction",
    "set_interior",
]

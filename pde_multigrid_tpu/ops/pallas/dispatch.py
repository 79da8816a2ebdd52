"""Select Pallas kernels for a (problem, geometry) pair.

Returns None when no fused kernel implementation covers the problem —
callers fall back to the jnp tier (cycles.JnpKernels).
"""

from __future__ import annotations


def make_kernels(problem, geoms):
    # Populated as fused kernels land (relax/residual/restrict/prolong).
    return None

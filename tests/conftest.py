"""Test environment: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are testable without TPU hardware (SURVEY.md §4
implication (d)).

Note: the session's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
(real TPU via a network relay), so plain env vars are too late here — we
must go through jax.config before any backend is initialized.  Unit tests
must be fast and hermetic; benchmarks (bench.py) are what run on the chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

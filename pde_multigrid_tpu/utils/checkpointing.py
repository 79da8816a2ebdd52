"""Checkpoint / resume (SURVEY.md §5: the reference has none — its closest
artifact is write-only log dumps).

Solver state is tiny and regular: (v, f) per level plus schedule progress.
Masks and coefficient fields are derivable (rebuilt by the solver), so
checkpoints store only the two persistent arrays per level — the same
storage contract as the reference's GridND (SURVEY.md §2.4).  Format:
a single .npz (portable, no framework lock-in).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from pde_multigrid_tpu.grid import Level


def save_levels(path: str, levels, meta: dict | None = None) -> None:
    """Write a hierarchy checkpoint (device arrays are fetched to host)."""
    arrs = {}
    for i, lvl in enumerate(levels):
        arrs[f"v{i}"] = np.asarray(jax.device_get(lvl.v))
        arrs[f"f{i}"] = np.asarray(jax.device_get(lvl.f))
    arrs["_meta"] = np.frombuffer(
        json.dumps(
            {"num_levels": len(levels), **(meta or {})}
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(path, **arrs)


def load_meta(path: str) -> dict:
    with np.load(path) as z:
        return json.loads(bytes(z["_meta"]).decode())


def load_levels(path: str, solver):
    """Restore a hierarchy into `solver`'s fresh levels (aux rebuilt).

    Returns (levels, meta).  Shapes must match the solver's geometry."""
    fresh = solver.fresh_levels()
    with np.load(path) as z:
        meta = json.loads(bytes(z["_meta"]).decode())
        if meta["num_levels"] != len(fresh):
            raise ValueError(
                f"checkpoint has {meta['num_levels']} levels, solver "
                f"expects {len(fresh)}"
            )
        out = []
        for i, lvl in enumerate(fresh):
            v = z[f"v{i}"]
            f = z[f"f{i}"]
            if v.shape != tuple(lvl.v.shape):
                raise ValueError(
                    f"level {i} shape mismatch: checkpoint {v.shape} vs "
                    f"solver {tuple(lvl.v.shape)}"
                )
            out.append(
                dataclasses.replace(
                    lvl,
                    v=jax.device_put(v, lvl.v.sharding),
                    f=jax.device_put(f, lvl.f.sharding),
                )
            )
    return tuple(out), meta

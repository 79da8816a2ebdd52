"""Grid dump / verification logging — executable parity with the
reference's Print* flow (SURVEY.md §3.4): PrintGrid_v, PrintDiffApproxReal,
PrintMeanAbsoluteError wrote per-point lines to log/*.txt via raw write()
(e.g. MultiGrid1D.cpp:216-247, Grid2D.cu:123-154).

Here the same information is available both as human-readable text dumps
(same fields: coordinates, approx, exact, diff) and as structured JSONL
records suitable for tooling."""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from pde_multigrid_tpu.grid import LevelGeometry, interior_mask


def _logical(arr: np.ndarray, geom: LevelGeometry) -> np.ndarray:
    return arr[tuple(slice(0, s) for s in geom.stored_shape)]


def dump_grid_v(
    path: str, level, geom: LevelGeometry, problem=None, max_points=None
) -> int:
    """Per-point dump of v (and the analytic solution when the problem is
    given) — the PrintGrid_v format.  Returns the number of lines."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    v = _logical(np.asarray(jax.device_get(level.v)), geom)
    exact = None
    if problem is not None:
        exact = _logical(
            np.asarray(problem.exact_solution(geom.coords())), geom
        )
    n = 0
    with open(path, "w") as fh:
        for idx in np.ndindex(*geom.stored_shape):
            coords = [
                geom.origin[d] + idx[d] * geom.spacing[d]
                for d in range(geom.ndim)
            ]
            cstr = " ".join(
                f"x{d}: {c:f}" for d, c in enumerate(coords)
            )
            line = f"{cstr} approxSol: {v[idx]:f}"
            if exact is not None:
                line += f"  realSol: {exact[idx]:f}"
            fh.write(line + "\n")
            n += 1
            if max_points and n >= max_points:
                break
    return n


def diff_stats(level, geom: LevelGeometry, problem) -> dict:
    """approx - exact statistics on the interior: the reference's
    PrintDiff / PrintMeanAbsoluteError metrics as a dict."""
    v = np.asarray(jax.device_get(level.v))
    exact = np.asarray(problem.exact_solution(geom.coords()))
    m = np.asarray(jax.device_get(level.aux["m_int"])) > 0
    diff = (v - exact)[m]
    return {
        "mae": float(np.mean(np.abs(diff))),
        "linf": float(np.max(np.abs(diff))),
        "l2": float(np.sqrt(np.mean(diff * diff))),
        "n_interior": int(m.sum()),
    }


def dump_diff_jsonl(path: str, level, geom: LevelGeometry, problem) -> dict:
    """JSONL record of the diff stats (modern PrintDiff)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rec = diff_stats(level, geom, problem)
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return rec

"""Ground-truth parity against the ACTUAL reference CPU binary.

Compiles the reference's NOCUDA 3D Poisson app (plain g++, its own
CompileAndLink recipe) in a temp dir with a smaller grid, runs it, parses
its log/diff.txt dump, and compares pointwise with our solver.

Both stacks converge to the same fine-level relaxation fixed point (the
discrete solution), so the converged fields must agree to float32
tolerance even though the reference's coarse-grid residuals carry sign
bugs (SURVEY.md §2.7.3) — those corruptions are relaxed away at its huge
sweep counts.  Empirically: at nu=50 the reference DIVERGES (MAE ~370 at
N=33) while this framework converges — the corrected numerics need ~60x
fewer sweeps.  Measured on TPU at the full thesis config (N=33,
FMG(2,3000,3000)): pointwise |ours - reference| Linf = 6.2e-6.
"""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

from pde_multigrid_tpu import (
    CycleConfig,
    MultigridSolver,
    Poisson3D,
    SolverConfig,
)
from pde_multigrid_tpu.grid import to_logical

REF = "/root/reference/NOCUDA_TESI/POISSON_3D(TESI)"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF) or shutil.which("g++") is None,
    reason="reference sources or g++ unavailable",
)

N = 17
NU_REF = 3000  # the reference needs its huge sweep counts to converge


@pytest.fixture(scope="module")
def reference_solution(tmp_path_factory):
    d = tmp_path_factory.mktemp("refbuild")
    for f in os.listdir(REF):
        if f.endswith((".cpp", ".h")):
            shutil.copy(os.path.join(REF, f), d)
    src = os.path.join(d, "Poisson3DSolver.cpp")
    code = open(src).read()
    code = code.replace("int equalSize = 129;", f"int equalSize = {N};")
    code = code.replace("int v1 = 3000;", f"int v1 = {NU_REF};")
    code = code.replace("int v2 = 3000;", f"int v2 = {NU_REF};")
    code = code.replace(
        "//multiGrid3D.PrintDiff();", "multiGrid3D.PrintDiff();"
    )
    open(src, "w").write(code)
    for unit in ("Grid3D.cpp", "MultiGrid3D.cpp", "Poisson3DSolver.cpp"):
        subprocess.run(
            ["g++", "-O2", "-c", unit], cwd=d, check=True,
            capture_output=True,
        )
    subprocess.run(
        ["g++", "Grid3D.o", "MultiGrid3D.o", "Poisson3DSolver.o", "-o",
         "Poisson3D"],
        cwd=d, check=True, capture_output=True,
    )
    os.makedirs(os.path.join(d, "log"), exist_ok=True)
    subprocess.run(
        ["./Poisson3D"], cwd=d, check=True, capture_output=True,
        timeout=300,
    )
    diff = np.zeros((N, N, N))  # indexed [y][x][z] per Grid3D::PrintDiff
    pat = re.compile(
        r"posY: (\d+) posX: (\d+) posZ: (\d+) diff: (-?[\d.]+)"
    )
    for line in open(os.path.join(d, "log", "diff.txt")):
        m = pat.match(line)
        py, px, pz = int(m.group(1)), int(m.group(2)), int(m.group(3))
        diff[py, px, pz] = float(m.group(4))
    x = np.linspace(0.0, 1.0, N)
    real = (
        np.sin(np.pi * x)[None, :, None]
        * np.sin(np.pi * x)[:, None, None]
        * np.sin(np.pi * x)[None, None, :]
    )
    return real - diff  # approx solution, [y][x][z]


def test_pointwise_parity_with_reference_binary(reference_solution):
    # ours converges to the same discrete fixed point with FAR fewer
    # sweeps (corrected residuals); nu=8 suffices at N=17
    cfg = SolverConfig(
        cycle=CycleConfig("fmg", 2, 8, 8), backend="jnp", max_cycles=3,
        tol=0.0,
    )
    s = MultigridSolver(Poisson3D(), N, cfg)
    r = s.solve_to_tolerance()
    ours = np.transpose(to_logical(r.v, s.geoms[0]), (1, 0, 2))
    d = np.abs(ours - reference_solution)
    assert d.max() < 5e-5
    assert d.mean() < 1e-5

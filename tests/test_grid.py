"""Hierarchy-construction invariants (reference contract checks, SURVEY.md §4.2)."""

import numpy as np
import pytest

from pde_multigrid_tpu.grid import (
    build_geometries,
    check_grid_size,
    coarsen_shape,
    num_levels_for,
    interior_mask,
    parity_mask,
    Hierarchy,
)
from pde_multigrid_tpu.models import Poisson, Ode1D


def test_grid_size_validation():
    assert check_grid_size(3) == 1
    assert check_grid_size(129) == 7
    for bad in (0, 1, 2, 4, 6, 100):
        with pytest.raises(ValueError):
            check_grid_size(bad)


def test_coarsen_recurrence():
    # reference MultiGrid1D.cpp:28
    assert coarsen_shape((129,)) == (65,)
    assert coarsen_shape((65, 33)) == (33, 17)


def test_num_levels():
    # finest 65 = 2^6+1 -> 6 levels (reference MultiGrid1D.cpp:21-22)
    assert num_levels_for((65,)) == 6
    assert num_levels_for((129, 129, 129)) == 7


def test_geometries_spacing():
    geoms = build_geometries((33,), ((0.0, 1.0),))
    assert len(geoms) == 5
    assert geoms[0].spacing == (1.0 / 32,)
    assert geoms[-1].shape == (3,)
    assert geoms[-1].spacing == (0.5,)


def test_masks():
    m = interior_mask((5, 5))
    assert m.sum() == 9
    red = parity_mask((5, 5), 0)
    assert red[0, 0] and not red[0, 1] and red[1, 1]
    assert (red ^ parity_mask((5, 5), 1)).all()


def test_hierarchy_build_poisson2d():
    h = Hierarchy.build(Poisson(2), 17)
    assert h.num_levels == 4
    assert h.levels[0].shape == (17, 17)
    assert h.levels[-1].shape == (3, 3)
    # boundary of v carries Dirichlet data, interior zero
    v0 = np.asarray(h.levels[0].v)
    m = interior_mask((17, 17))
    assert np.all(v0[m] == 0.0)


def test_hierarchy_boundary_values_ode1d():
    h = Hierarchy.build(Ode1D(), 33)
    v = np.asarray(h.levels[0].v)
    # u(x) = (e^x + x - 3)/(1 + e^-x) at both ends (Grid1D.cpp:30-34)
    for idx, x in ((0, 0.0), (-1, 1.0)):
        expect = (np.exp(x) + x - 3) / (1 + np.exp(-x))
        assert abs(v[idx] - expect) < 5e-6  # float32 init

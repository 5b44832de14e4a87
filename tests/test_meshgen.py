"""Mesh-generator lanes: every builder loads, compiles, and minimizes."""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.meshgen import BUILDERS, build

# one representative per family keeps this in the fast unit lane
FAST = ["cube", "square_sheet", "catenoid", "torus", "flat_disk", "rect_tilt_source"]


@pytest.mark.parametrize("name", FAST)
def test_builder_minimizes(name):
    mesh = parse_geometry(build(name))
    mn = Minimizer(mesh, quiet=True)
    e0 = float(mn.compute_energy())
    mn.minimize(3)
    e1 = float(mn.compute_energy())
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 <= e0 + 1e-9


def test_all_builders_parse():
    for name in sorted(BUILDERS):
        mesh = parse_geometry(build(name))
        assert len(mesh.vertices) >= 6
        assert len(mesh.facets) >= 4


def test_kozlov_lane_drives_tilt():
    """The standalone caveolin lane develops a theta_B-driven tilt field."""
    mesh = parse_geometry(build("kozlov_1disk"))
    mn = Minimizer(mesh, quiet=True)
    mn.minimize(2)
    tin = np.asarray(mn.problem().state.tilts_in)
    assert float(np.linalg.norm(tin, axis=1).max()) > 0.25  # theta_B = 0.3 enforced


def test_torus_gauss_bonnet_zero():
    """Genus-1 closed shell: Gauss-Bonnet total is 2*pi*chi = 0."""
    from membrane_solver_tpu.energy.gaussian_curvature import gauss_bonnet_total

    mesh = parse_geometry(build("torus"))
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    g = float(gauss_bonnet_total(p.state.positions, p.topo))
    assert abs(g) < 1e-8

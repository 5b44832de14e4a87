#!/usr/bin/env python3
"""Reproduce the reference's minimize-entry state corruption (dented_cube).

Evidence for the documented 1e-8 exemption on the cap / two_disks_sphere /
dented_cube lanes (tests/test_lanes_e2e.py): on the UNIT CUBE with its
volume constraint exactly satisfied (V = 1.0 = target), the reference's
``Minimizer.enforce_constraints_after_mesh_ops`` — the call its own
``minimize()`` makes at entry — leaves the mesh in a corrupted state:

    E fresh:                 6.0
    E after mesh-op enforce: 3.756580836846223      (area 3.7566)
    positions head:          [[0.48585786 0. 0.48585786] ...]

i.e. a hard projection that should be a no-op (|V - V0| = 0 < tol)
physically crushes the cube toward its centroid because the projection's
internal iteration acts on a stale cached positions view.  Every
subsequent line-search energy in the same process is evaluated against
this corrupted state, so the reference's recorded per-command energies on
these lanes (tests/fixtures/reference_lane_traces.json) trace a
stale-view zigzag (step-0 "energy" 3.75 -> step-1 5.79) that a
pure-functional solver cannot reproduce without reimplementing the
reference's version-counter cache engine, bugs included.  The recorded
worst/final relative deltas of this solver vs those traces are
cap 4.4e-3/4.2e-3, two_disks 4.0e-3/9.0e-4, dented_cube 2.1e-2/7.6e-5.

Run (requires the mounted reference):
    python tools/ref_entry_enforcement_corruption_repro.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/reference")


def main() -> None:
    import numpy as np
    from commands.context import CommandContext  # noqa: F401  (import check)
    from geometry.geom_io import load_data, parse_geometry
    from runtime.constraint_manager import ConstraintModuleManager
    from runtime.energy_manager import EnergyModuleManager
    from runtime.minimizer import Minimizer
    from runtime.steppers.gradient_descent import GradientDescent

    mesh = parse_geometry(
        load_data("/root/reference/benchmarks/inputs/bench_dented_cube.json")
    )
    em = EnergyModuleManager(mesh.energy_modules)
    cm = ConstraintModuleManager(mesh.constraint_modules)
    mn = Minimizer(
        mesh, mesh.global_parameters, GradientDescent(), em, cm, quiet=True
    )
    e_fresh = float(mn.compute_energy())
    print(f"E fresh:                 {e_fresh}")
    assert abs(e_fresh - 6.0) < 1e-12

    mn.enforce_constraints_after_mesh_ops(mesh)
    e_after = float(mn.compute_energy())
    area = float(mesh.compute_total_surface_area())
    print(f"E after mesh-op enforce: {e_after}")
    print(f"area:                    {area}")
    print("positions head:", np.asarray(mesh.positions_view())[:2])
    if abs(e_after - 6.0) > 1e-6:
        print(
            "CONFIRMED: a no-op-by-construction projection changed the state "
            f"(|dE| = {abs(e_after - 6.0):.6f})"
        )
    else:
        print("NOT REPRODUCED on this reference checkout")


if __name__ == "__main__":
    main()

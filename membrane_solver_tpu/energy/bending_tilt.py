"""Coupled Helfrich + tilt-splay energy on the single vertex tilt field.

Parity: reference ``modules/energy/bending_tilt.py``:

    E = 1/2 integral kappa (2H - c0 + div t)^2 dA

assembled per corner with the bending module's effective (boundary-
redistributed mixed-Voronoi) areas; ``t`` is the mesh's single 3D tilt field
(``state.tilts``), div from P1 elements.  The tilt gradient is exact for the
discretization; the shape gradient treats div(t) as frozen (the reference's
documented approximation) — both realized by the stop_gradient composition in
``bending_tilt_leaflet.leaflet_bending_tilt_energy`` with div_sign = +1 and
the plain ``bending_modulus`` / ``spontaneous_curvature`` parameters.
"""

from __future__ import annotations

from membrane_solver_tpu.energy.bending_tilt_leaflet import leaflet_bending_tilt_energy

USES_TILT = True


def energy(geo, state, topo, params):
    return leaflet_bending_tilt_energy(
        state,
        topo,
        params,
        tilts=state.tilts,
        kappa_key="bending_modulus",
        div_sign=1.0,
        c0_key="spontaneous_curvature",
    )

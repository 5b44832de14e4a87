"""Bilayer caveolin rim source: E = -sum gamma L ((t_in + t_out)_avg . r_hat).

Parity: reference ``modules/energy/tilt_rim_source_bilayer.py`` (see
``_rim_source.py`` for the shared discretization and frame rules).  Signed
work term acting on the sum of both leaflet tilts.
"""

from __future__ import annotations

from membrane_solver_tpu.energy import _rim_source

USES_TILT_LEAFLETS = True
IS_EXTERNAL_WORK = True

compile_topology = _rim_source.build_compile_topology(
    "tilt_rim_source_bilayer", "tilt_rim_source_group",
    "tilt_rim_source_strength", "",
)


def energy(geo, state, topo, params):
    return _rim_source.rim_source_energy(
        state, topo, params,
        prefix="tilt_rim_source_bilayer",
        strength_key="tilt_rim_source_strength",
        fields=("tilts_in", "tilts_out"),
    )

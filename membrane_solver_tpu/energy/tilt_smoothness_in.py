"""Inner-leaflet tilt smoothness (Dirichlet) energy.

Parity: reference ``modules/energy/tilt_smoothness_in.py`` — rigidity defaults
to ``bending_modulus_in`` (falling back to ``bending_modulus``); same cotan
Dirichlet form as tilt_smoothness with no shape-gradient contribution.
"""

from __future__ import annotations

import jax.numpy as jnp

from membrane_solver_tpu.energy.leaflet_presence import present_triangles
from membrane_solver_tpu.energy.tilt_smoothness import smoothness_energy

USES_TILT_LEAFLETS = True


def make_energy(spec):
    transport = spec.option("tilt_transport_model", "ambient_v1")

    def fn(geo, state, topo, params):
        k = params.get("bending_modulus_in", params.get("bending_modulus", jnp.asarray(0.0)))
        return smoothness_energy(state.positions, state.tilts_in, topo, k, transport, present_triangles(topo, "in"))

    return fn


def energy(geo, state, topo, params):
    k = params.get("bending_modulus_in", params.get("bending_modulus", jnp.asarray(0.0)))
    return smoothness_energy(state.positions, state.tilts_in, topo, k, "ambient_v1", present_triangles(topo, "in"))


def make_tilt_frozen(spec):
    """Frozen-geometry split for the inner tilt solve (positions constant)."""
    from membrane_solver_tpu.energy.tilt_smoothness_leaflet import (
        make_leaflet_smoothness_frozen,
    )

    return make_leaflet_smoothness_frozen(spec, "in")

"""Single-field tilt magnitude energy: E = 1/2 k_t sum |t|^2 A_v.

Parity: reference ``modules/energy/tilt.py`` (uses the shared leaflet core
with the single ``tilt`` field and the ``tilt_rigidity``/``tilt_modulus``
modulus).
"""

from __future__ import annotations

import jax.numpy as jnp

from membrane_solver_tpu.energy.tilt_leaflet import leaflet_energy

USES_TILT = True


def energy(geo, state, topo, params):
    k = params.get("tilt_rigidity", params.get("tilt_modulus", jnp.asarray(0.0)))
    return leaflet_energy(geo, state.tilts, topo, k, "lumped")

"""Soft volume penalty: E = sum_b 0.5 * k_b * (V_b - V0_b)^2.

Parity: reference ``modules/energy/volume.py`` — active only in
``volume_constraint_mode == "penalty"`` (spec-static, so this module traces to
zero work in lagrange mode); V0 defaults to 0 when a body has no target;
stiffness is the body option else the global ``volume_stiffness``.
"""

from __future__ import annotations

import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo

USES_TILT = False
USES_TILT_LEAFLETS = False


def energy(geo, state, topo, params):
    nb_cap = topo.body_valid.shape[0]
    vols = dgeo.body_volumes(
        state.positions, topo.tri_rows, topo.tri_valid, topo.tri_body, nb_cap
    )
    delta = vols - topo.body_target_volume
    contrib = 0.5 * topo.body_volume_stiffness * delta**2
    return jnp.sum(jnp.where(topo.body_valid, contrib, 0.0))

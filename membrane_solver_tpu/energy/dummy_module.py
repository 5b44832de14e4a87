"""Test-fixture energy module (parity: modules/energy/dummy_module.py)."""

from __future__ import annotations

import jax.numpy as jnp

USES_TILT = False
USES_TILT_LEAFLETS = False

CALLS = {"count": 0}


def energy(geo, state, topo, params):
    CALLS["count"] += 1  # traced once per compilation, not per call
    return jnp.asarray(0.0, state.positions.dtype)

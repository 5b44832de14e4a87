"""Surface tension energy: E = sum_f gamma_f * A_f.

Parity: reference ``modules/energy/surface.py`` (gamma per facet with global
fallback; analytic area gradient).  Here the gradient is obtained by AD
through the masked area computation, which reproduces the analytic
``0.5 * (v_next - v_prev) x n_hat`` corner gradients exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

USES_TILT = False
USES_TILT_LEAFLETS = False


def energy(geo, state, topo, params):
    return jnp.sum(topo.tri_surface_tension * geo.area)

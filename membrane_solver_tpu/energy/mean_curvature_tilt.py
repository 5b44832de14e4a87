"""Legacy mean-curvature + tilt stub (kept for name parity; inert).

Parity: reference ``modules/mean_curvature_tilt.py`` — a 45-line legacy sketch
that calls per-facet methods (``facet.compute_mean_curvature`` etc.) which do
not exist on the reference's Facet class; loading it and evaluating raises
AttributeError there.  The maintained coupled formulation lives in
``bending_tilt`` / ``bending_tilt_leaflet``.  Here the module registers but
contributes zero energy and logs a deprecation warning once, which is the
closest well-defined behavior to "present but unusable".
"""

from __future__ import annotations

import logging

import jax.numpy as jnp

USES_TILT = True

_warned = False


def energy(geo, state, topo, params):
    global _warned
    if not _warned:
        logging.getLogger("membrane_solver_tpu").warning(
            "mean_curvature_tilt is a legacy stub; use bending_tilt instead"
        )
        _warned = True
    return jnp.asarray(0.0, state.positions.dtype)

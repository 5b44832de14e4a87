"""Soft body-surface-area penalty: E = 0.5 * k * (A_body - A0)^2.

Parity: reference ``modules/energy/body_area_penalty.py`` — bodies with an
``area_target`` option; stiffness = body option ``area_stiffness`` else the
global value (module inert when k == 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

USES_TILT = False
USES_TILT_LEAFLETS = False


def compile_topology(layout) -> dict:
    nb = len(layout.body_ids)
    target = np.zeros(max(nb, 1))
    has = np.zeros(max(nb, 1), dtype=bool)
    k = np.zeros(max(nb, 1))
    has_k = np.zeros(max(nb, 1), dtype=bool)
    for slot, bid in enumerate(layout.body_ids):
        opts = layout.mesh.bodies[bid].options
        if opts.get("area_target") is not None:
            target[slot] = float(opts["area_target"])
            has[slot] = True
        if opts.get("area_stiffness") is not None:
            k[slot] = float(opts["area_stiffness"])
            has_k[slot] = True
    return {
        "target": layout.pad_rows(target, layout.nb_cap, 0.0),
        "has": layout.pad_rows(has, layout.nb_cap, False),
        "k": layout.pad_rows(k, layout.nb_cap, 0.0),
        "has_k": layout.pad_rows(has_k, layout.nb_cap, False),
    }


def energy(geo, state, topo, params):
    nb_cap = topo.body_valid.shape[0]
    areas = jax.ops.segment_sum(geo.area, topo.tri_body, num_segments=nb_cap + 1)[:nb_cap]
    default_k = params.get("area_stiffness", jnp.asarray(0.0))
    k = jnp.where(
        topo.extras["energy:body_area_penalty/has_k"],
        topo.extras["energy:body_area_penalty/k"],
        default_k,
    )
    active = topo.body_valid & topo.extras["energy:body_area_penalty/has"] & (k != 0.0)
    delta = areas - topo.extras["energy:body_area_penalty/target"]
    return jnp.sum(jnp.where(active, 0.5 * k * delta**2, 0.0))

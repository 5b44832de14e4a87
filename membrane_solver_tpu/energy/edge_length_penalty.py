"""Edge-length penalty: E = 0.5 * k * (|edge| - L0)^2 over tagged edges.

Parity: reference ``modules/energy/edge_length_penalty.py`` — edges with a
``target_length`` option (or explicit module tag + target); stiffness is the
global ``edge_stiffness`` (default 100).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device.geo import safe_norm

USES_TILT = False
USES_TILT_LEAFLETS = False


def compile_topology(layout) -> dict:
    n = len(layout.edge_ids)
    active = np.zeros(n, dtype=bool)
    target = np.zeros(n, dtype=np.float64)
    for slot, eid in enumerate(layout.edge_ids):
        opts = layout.mesh.edges[eid].options or {}
        if opts.get("target_length") is not None:
            active[slot] = True
            target[slot] = float(opts["target_length"])
    return {
        "active": layout.pad_rows(active, layout.ne_cap, False),
        "target": layout.pad_rows(target, layout.ne_cap, 0.0),
    }


def energy(geo, state, topo, params):
    active = topo.extras["energy:edge_length_penalty/active"] & topo.edge_valid
    target = topo.extras["energy:edge_length_penalty/target"]
    k = params.get("edge_stiffness", jnp.asarray(100.0))
    vecs = (
        state.positions[topo.edge_rows[:, 1]] - state.positions[topo.edge_rows[:, 0]]
    )
    lengths = safe_norm(vecs, eps=1e-15)
    contrib = 0.5 * k * (lengths - target) ** 2
    return jnp.sum(jnp.where(active & (lengths > 0), contrib, 0.0))

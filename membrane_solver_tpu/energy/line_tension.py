"""Line-tension energy: E = sum over tagged edges of gamma_e * |edge|.

Parity: reference ``modules/energy/line_tension.py`` — an edge participates
when its options list the ``line_tension`` energy or carry a ``line_tension``
value; gamma is the edge option else ``global_params.line_tension``; edges
shorter than 1e-15 contribute nothing (zero gradient).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device.geo import safe_norm

USES_TILT = False
USES_TILT_LEAFLETS = False


def compile_topology(layout) -> dict:
    """Per-edge activation mask and explicit-gamma table."""
    n = len(layout.edge_ids)
    active = np.zeros(n, dtype=bool)
    explicit = np.zeros(n, dtype=np.float64)
    has_explicit = np.zeros(n, dtype=bool)
    for slot, eid in enumerate(layout.edge_ids):
        opts = layout.mesh.edges[eid].options or {}
        energy = opts.get("energy")
        tagged = (
            energy == "line_tension"
            or (isinstance(energy, (list, tuple)) and "line_tension" in energy)
            or "line_tension" in opts
        )
        if tagged:
            active[slot] = True
            if "line_tension" in opts:
                explicit[slot] = float(opts["line_tension"])
                has_explicit[slot] = True
    return {
        "active": layout.pad_rows(active, layout.ne_cap, False),
        "gamma": layout.pad_rows(explicit, layout.ne_cap, 0.0),
        "has_gamma": layout.pad_rows(has_explicit, layout.ne_cap, False),
    }


def energy(geo, state, topo, params):
    active = topo.extras["energy:line_tension/active"] & topo.edge_valid
    default_gamma = params.get("line_tension", jnp.asarray(0.0))
    gamma = jnp.where(
        topo.extras["energy:line_tension/has_gamma"],
        topo.extras["energy:line_tension/gamma"],
        default_gamma,
    )
    vecs = (
        state.positions[topo.edge_rows[:, 1]] - state.positions[topo.edge_rows[:, 0]]
    )
    lengths = safe_norm(vecs, eps=1e-15)
    return jnp.sum(jnp.where(active, gamma * lengths, 0.0))

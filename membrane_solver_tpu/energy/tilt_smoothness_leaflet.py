"""Unified leaflet tilt-smoothness energy (both leaflets in one module).

Parity: reference ``modules/energy/tilt_smoothness_leaflet.py`` — the shared
implementation the per-leaflet modules delegate to; loadable directly so
input files naming it resolve.  Sums the Dirichlet smoothness of both
leaflet tilt fields with their per-leaflet rigidities (k from
bending_modulus_{in,out}; no shape gradient — same stop-gradient policy as
tilt_smoothness).
"""

from __future__ import annotations

import jax.numpy as jnp

from membrane_solver_tpu.energy.leaflet_presence import present_triangles
from membrane_solver_tpu.energy.tilt_smoothness import smoothness_energy

USES_TILT_LEAFLETS = True


def make_energy(spec):
    transport = spec.option("tilt_transport_model", "ambient_v1")

    def fn(geo, state, topo, params):
        zero = jnp.asarray(0.0)
        k_in = params.get("bending_modulus_in", params.get("bending_modulus", zero))
        k_out = params.get("bending_modulus_out", params.get("bending_modulus", zero))
        e_in = smoothness_energy(
            state.positions, state.tilts_in, topo, k_in, transport,
            present_triangles(topo, "in"),
        )
        e_out = smoothness_energy(
            state.positions, state.tilts_out, topo, k_out, transport,
            present_triangles(topo, "out"),
        )
        return e_in + e_out

    return fn


def energy(geo, state, topo, params):
    return make_energy_default(geo, state, topo, params)


def make_energy_default(geo, state, topo, params):
    zero = jnp.asarray(0.0)
    k_in = params.get("bending_modulus_in", params.get("bending_modulus", zero))
    k_out = params.get("bending_modulus_out", params.get("bending_modulus", zero))
    return smoothness_energy(
        state.positions, state.tilts_in, topo, k_in, "ambient_v1",
        present_triangles(topo, "in"),
    ) + smoothness_energy(
        state.positions, state.tilts_out, topo, k_out, "ambient_v1",
        present_triangles(topo, "out"),
    )

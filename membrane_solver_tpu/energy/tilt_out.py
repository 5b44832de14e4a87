"""Outer-leaflet tilt magnitude energy (reference modules/energy/tilt_out.py)."""

from __future__ import annotations

from membrane_solver_tpu.energy.tilt_leaflet import make_leaflet_energy

USES_TILT_LEAFLETS = True


def make_energy(spec):
    return make_leaflet_energy(spec, "out")


def energy(geo, state, topo, params):
    import jax.numpy as jnp

    from membrane_solver_tpu.energy.tilt_leaflet import leaflet_energy

    return leaflet_energy(
        geo, state.tilts_out, topo, params.get("tilt_modulus_out", jnp.asarray(0.0)), "lumped"
    )


def make_inloop_energy(spec):
    """Relax-loop objective (reference eval-manager fast path; see
    tilt_leaflet.make_leaflet_inloop_energy)."""
    from membrane_solver_tpu.energy.tilt_leaflet import make_leaflet_inloop_energy

    return make_leaflet_inloop_energy(spec, "out")


def make_tilt_frozen(spec):
    """Frozen-geometry split for the inner tilt solve (positions constant)."""
    from membrane_solver_tpu.energy.tilt_leaflet import make_leaflet_tilt_frozen

    return make_leaflet_tilt_frozen(spec, "out")


def compile_topology(layout) -> dict:
    from membrane_solver_tpu.energy.tilt_leaflet import (
        compile_active_row_weights,
    )

    w = compile_active_row_weights(layout, "out")
    return {} if w is None else {"row_weights": w}

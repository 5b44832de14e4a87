"""Inner-leaflet bending-tilt coupling (kappa_key=bending_modulus_in, div_sign=-1).

Parity: reference ``modules/energy/bending_tilt_in.py``.
"""

from __future__ import annotations

from membrane_solver_tpu.energy.bending_tilt_leaflet import leaflet_bending_tilt_energy
from membrane_solver_tpu.energy.leaflet_presence import present_triangles

USES_TILT_LEAFLETS = True


def energy(geo, state, topo, params):
    return leaflet_bending_tilt_energy(
        state,
        topo,
        params,
        tilts=state.tilts_in,
        kappa_key="bending_modulus_in",
        div_sign=-1.0,
        c0_key="spontaneous_curvature_in",
        tri_present=present_triangles(topo, "in"),
    )


def make_tilt_frozen(spec):
    """Frozen-geometry split for the inner tilt solve (positions constant)."""
    from membrane_solver_tpu.energy.bending_tilt_leaflet import (
        make_leaflet_bending_tilt_frozen,
    )

    return make_leaflet_bending_tilt_frozen(
        spec,
        leaflet="in",
        kappa_key="bending_modulus_in",
        div_sign=-1.0,
        c0_key="spontaneous_curvature_in",
    )


def _combined_zero_mask(topo, leaflet):
    """assume-J0 preset rows plus benchmark base-term region rows."""
    import jax.numpy as jnp

    j0 = topo.extras.get(f"energy:bending_tilt_{leaflet}/assume_J0")
    region = topo.extras.get(f"energy:bending_tilt_{leaflet}/region_zero")
    if region is None:
        return j0
    if j0 is None:
        return region
    return j0 | region


def make_energy(spec):
    """Static-mode-aware energy (theory-parity base/divergence overrides)."""
    from membrane_solver_tpu.energy.bending_tilt_leaflet import static_modes

    zero_base, recovered = static_modes(spec, "in")

    def fn(geo, state, topo, params):
        return leaflet_bending_tilt_energy(
            state,
            topo,
            params,
            tilts=state.tilts_in,
            kappa_key="bending_modulus_in",
            div_sign=-1.0,
            c0_key="spontaneous_curvature_in",
            tri_present=present_triangles(topo, "in"),
            zero_base=zero_base,
            j0_mask=_combined_zero_mask(topo, "in"),
            recovered_div=recovered,
        )

    return fn


def compile_topology(layout):
    from membrane_solver_tpu.energy.bending_tilt_leaflet import (
        compile_assume_J0,
        compile_base_term_region_zero,
    )

    out = dict(compile_assume_J0(layout, "in"))
    region = compile_base_term_region_zero(layout, "in")
    if region is not None:
        out["region_zero"] = region
    return out

"""Leaflet tilt magnitude energy core: E = 1/2 k_t sum_v |t_v|^2 A_v.

Parity: reference ``modules/energy/tilt_leaflet.py`` — per-triangle assembly

    lumped:     coeff = 1/2 k (|t0|^2+|t1|^2+|t2|^2)/3
    consistent: coeff = k/12 (|t|^2 terms + cross terms)
    E = sum coeff * A_tri

with exact tilt gradients and the analytic shape gradient coeff * dA/dx
(identical to AD of this expression).  Mass mode from ``tilt_mass_mode[_in/
_out]`` (default lumped).  The leaflet-absent mask and shared-rim row-weight
machinery activate only when the corresponding vertex tags exist.
"""

from __future__ import annotations

import jax.numpy as jnp

USES_TILT_LEAFLETS = True


def leaflet_energy(geo, tilts, topo, k_tilt, mass_mode: str, present_tri=None):
    t0 = tilts[topo.tri_rows[:, 0]]
    t1 = tilts[topo.tri_rows[:, 1]]
    t2 = tilts[topo.tri_rows[:, 2]]
    sq = (
        jnp.sum(t0 * t0, axis=1) + jnp.sum(t1 * t1, axis=1) + jnp.sum(t2 * t2, axis=1)
    )
    if mass_mode == "consistent":
        s = sq + (
            jnp.sum(t0 * t1, axis=1)
            + jnp.sum(t1 * t2, axis=1)
            + jnp.sum(t2 * t0, axis=1)
        )
        coeff = (k_tilt / 12.0) * s
    else:
        coeff = 0.5 * k_tilt * (sq / 3.0)
    area = geo.area
    if present_tri is not None:
        area = jnp.where(present_tri, area, 0.0)
    return jnp.sum(coeff * area)


def make_leaflet_energy(spec, leaflet: str):
    mass_mode = spec.option(f"tilt_mass_mode_{leaflet}", spec.option("tilt_mass_mode", "lumped"))

    def fn(geo, state, topo, params):
        from membrane_solver_tpu.energy.leaflet_presence import present_triangles

        k = params.get(f"tilt_modulus_{leaflet}", jnp.asarray(0.0))
        tilts = state.tilts_in if leaflet == "in" else state.tilts_out
        return leaflet_energy(
            geo, tilts, topo, k, mass_mode, present_triangles(topo, leaflet)
        )

    return fn


def make_leaflet_tilt_frozen(spec, leaflet: str):
    """Frozen split for the inner tilt solve (positions constant).

    precompute() bakes the masked triangle areas once per relax call; the
    per-iteration energy is then just corner gathers + the quadratic mass
    form — the identical arithmetic as :func:`leaflet_energy` on frozen
    positions, so values and tilt gradients match the full path exactly.
    """
    mass_mode = spec.option(f"tilt_mass_mode_{leaflet}", spec.option("tilt_mass_mode", "lumped"))

    def precompute(state, topo, params):
        from membrane_solver_tpu.device import geo as dgeo
        from membrane_solver_tpu.energy.leaflet_presence import present_triangles

        geo = dgeo.triangle_geometry(state.positions, topo.tri_rows, topo.tri_valid)
        area = geo.area
        present = present_triangles(topo, leaflet)
        if present is not None:
            area = jnp.where(present, area, 0.0)
        return {"area": area}

    def energy(tin, tout, fr, topo, params, ctx=None):
        k_tilt = params.get(f"tilt_modulus_{leaflet}", jnp.asarray(0.0))
        if ctx is not None:
            corners = ctx["tin_c"] if leaflet == "in" else ctx["tout_c"]
            t0, t1, t2 = corners[:, 0], corners[:, 1], corners[:, 2]
        else:
            tilts = tin if leaflet == "in" else tout
            t0 = tilts[topo.tri_rows[:, 0]]
            t1 = tilts[topo.tri_rows[:, 1]]
            t2 = tilts[topo.tri_rows[:, 2]]
        sq = (
            jnp.sum(t0 * t0, axis=1) + jnp.sum(t1 * t1, axis=1) + jnp.sum(t2 * t2, axis=1)
        )
        if mass_mode == "consistent":
            s = sq + (
                jnp.sum(t0 * t1, axis=1)
                + jnp.sum(t1 * t2, axis=1)
                + jnp.sum(t2 * t0, axis=1)
            )
            coeff = (k_tilt / 12.0) * s
        else:
            coeff = 0.5 * k_tilt * (sq / 3.0)
        return jnp.sum(coeff * fr["area"])

    return precompute, energy

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


def make_leaflet_smoothness_frozen(spec, leaflet: str):
    """Frozen split of the per-leaflet Dirichlet smoothness (positions constant).

    precompute() bakes the cotan weights (and, for connection_v1 transport,
    the corner/triangle normals driving the minimal-rotation transport) once
    per relax call; the per-iteration energy is corner gathers + the
    quadratic Dirichlet form — identical arithmetic to
    :func:`membrane_solver_tpu.energy.tilt_smoothness.smoothness_energy`
    on frozen positions (the full path stop-gradients positions anyway, so
    tilt gradients match exactly).
    """
    from membrane_solver_tpu.device import geo as dgeo
    from membrane_solver_tpu.energy.tilt_smoothness import minimal_rotation

    transport = spec.option("tilt_transport_model", "ambient_v1")

    def precompute(state, topo, params):
        positions = state.positions
        n_rows = positions.shape[0]
        curv = dgeo.curvature_data(positions, topo.tri_rows, topo.tri_valid, n_rows)
        present = present_triangles(topo, leaflet)
        keep = topo.tri_valid if present is None else (topo.tri_valid & present)
        out = {"weights": curv.weights, "keep": keep}
        if transport == "connection_v1":
            geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
            vn = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
            out["corner_normals"] = vn[topo.tri_rows]
            out["unit_normal"] = geo.unit_normal
        return out

    def energy(tin, tout, fr, topo, params, ctx=None):
        k = params.get(
            f"bending_modulus_{leaflet}", params.get("bending_modulus", jnp.asarray(0.0))
        )
        if ctx is not None:
            corners = ctx["tin_c"] if leaflet == "in" else ctx["tout_c"]
        else:
            tilts = tin if leaflet == "in" else tout
            corners = tilts[topo.tri_rows]
        if transport == "connection_v1":
            un = fr["unit_normal"]
            t0 = minimal_rotation(corners[:, 0], fr["corner_normals"][:, 0], un)
            t1 = minimal_rotation(corners[:, 1], fr["corner_normals"][:, 1], un)
            t2 = minimal_rotation(corners[:, 2], fr["corner_normals"][:, 2], un)
        else:
            t0, t1, t2 = corners[:, 0], corners[:, 1], corners[:, 2]
        w = fr["weights"]
        d12 = t1 - t2
        d20 = t2 - t0
        d01 = t0 - t1
        per_tri = (
            w[:, 0] * jnp.sum(d12 * d12, axis=1)
            + w[:, 1] * jnp.sum(d20 * d20, axis=1)
            + w[:, 2] * jnp.sum(d01 * d01, axis=1)
        )
        return (k / 4.0) * jnp.sum(jnp.where(fr["keep"], per_tri, 0.0))

    return precompute, energy


def make_tilt_frozen(spec):
    """Frozen-geometry split for the unified both-leaflet module."""
    pre_in, fn_in = make_leaflet_smoothness_frozen(spec, "in")
    pre_out, fn_out = make_leaflet_smoothness_frozen(spec, "out")

    def precompute(state, topo, params):
        return {"in": pre_in(state, topo, params), "out": pre_out(state, topo, params)}

    def energy(tin, tout, fr, topo, params, ctx=None):
        return fn_in(tin, tout, fr["in"], topo, params, ctx) + fn_out(
            tin, tout, fr["out"], topo, params, ctx
        )

    return precompute, energy


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

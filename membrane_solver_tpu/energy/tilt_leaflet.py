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


def compile_trace_layer_row_weights(layout):
    """Explicit trace-layer active-row tilt weights, or None.

    Parity: reference modules/energy/tilt_utils.py:154-199
    (_explicit_trace_layer_active_row_weights) — on physical-edge trace
    lanes (mode physical_edge_staggered_v1, parity_trace_layer_radius set,
    a named theory_parity_lane), rows on the trace shell carry weight
    sqrt((rim_r - disk_r) / (outer_r - disk_r)); the energy then uses
    tilts * w (so |t|^2 terms scale by the shell fraction) for BOTH
    leaflets.
    """
    import numpy as np

    gp = layout.mesh.global_parameters
    mode = str(gp.get("rim_slope_match_mode") or "").strip().lower()
    trace_radius = gp.get("parity_trace_layer_radius")
    lane = str(gp.get("theory_parity_lane") or "").strip()
    if mode != "physical_edge_staggered_v1" or trace_radius is None or not lane:
        return None
    from membrane_solver_tpu.constraints.local_interface_shells import (
        build_shell_rows,
    )

    shells = build_shell_rows(layout, group="disk")
    if shells is None:
        return None
    denom = float(shells.outer_radius) - float(shells.disk_radius)
    numer = float(shells.rim_radius) - float(shells.disk_radius)
    if denom <= 1e-12:
        return None
    frac = min(1.0, max(0.0, numer / denom))
    w = np.ones(len(layout.vertex_ids), dtype=float)
    w[np.asarray(shells.rim_rows, dtype=int)] = float(np.sqrt(frac))
    return layout.pad_rows(w, layout.nv_cap, 1.0)


def compile_shared_rim_row_weights(layout, leaflet: str):
    """Shared-rim diagnostic row weights, or None.

    Parity: reference modules/energy/tilt_utils.py:77-151
    (_shared_rim_active_row_weights) with the key-alias resolution of
    tilt_params.py:26-46 — rows tagged ``rim_slope_match_group == rim``
    drop to weight 0 under ``tilt_in_exclude_shared_rim_rows``; outer-
    tagged rows (or, untagged, the first local-interface outer shell)
    drop to 0 under ``tilt_{leaflet}_exclude_shared_rim_outer_rows`` or
    scale by sqrt(tilt_in_shared_rim_outer_row_energy_weight).
    """
    import numpy as np

    gp = layout.mesh.global_parameters

    def flag(*keys) -> bool:
        for k in keys:
            raw = gp.get(k)
            if raw is not None:
                if isinstance(raw, str):
                    return raw.strip().lower() in {"1", "true", "yes", "on"}
                return bool(raw)
        return False

    keys = [
        f"tilt_{leaflet}_exclude_shared_rim_outer_rows",
        f"tilt_exclude_shared_rim_outer_rows_{leaflet}",
    ]
    if leaflet == "out":
        keys += ["tilt_out_exclude_shared_rim_rows", "tilt_exclude_shared_rim_rows_out"]
    exclude_outer = flag(*keys)
    exclude_rim = False
    outer_row_energy_weight = None
    if leaflet == "in":
        exclude_rim = flag(
            "tilt_in_exclude_shared_rim_rows", "tilt_exclude_shared_rim_rows_in"
        )
        raw = gp.get("tilt_in_shared_rim_outer_row_energy_weight")
        if raw is not None:
            w = float(raw)
            if not np.isfinite(w) or w < 0.0:
                raise ValueError(
                    "tilt_in_shared_rim_outer_row_energy_weight must be a "
                    "finite non-negative number"
                )
            outer_row_energy_weight = w
    if not (exclude_rim or exclude_outer or outer_row_energy_weight is not None):
        return None

    mesh = layout.mesh
    n = len(layout.vertex_ids)
    # outer shell rows: explicitly tagged 'outer' rows; else the first
    # local-interface outer shell (tilt_utils.py:55-70)
    tagged = []
    groups = []
    for row, vid in enumerate(layout.vertex_ids):
        opts = mesh.vertices[int(vid)].options or {}
        group = str(opts.get("rim_slope_match_group") or "")
        groups.append(group)
        if group == "outer":
            tagged.append(row)
    outer_mask = np.zeros(n, dtype=bool)
    if tagged:
        outer_mask[np.asarray(tagged, dtype=int)] = True
    else:
        from membrane_solver_tpu.constraints.local_interface_shells import (
            build_shell_rows,
        )

        try:
            shells = build_shell_rows(layout, group="disk")
        except AssertionError:
            shells = None
        if shells is not None:
            outer_mask[np.asarray(shells.outer_rows, dtype=int)] = True

    outer_scale = (
        None if outer_row_energy_weight is None else float(np.sqrt(outer_row_energy_weight))
    )
    weights = np.ones(n, dtype=float)
    for row in range(n):
        if exclude_rim and groups[row] == "rim":
            weights[row] = 0.0
            continue
        if groups[row] == "outer" or outer_mask[row]:
            if exclude_outer:
                weights[row] = 0.0
            elif outer_scale is not None:
                weights[row] = outer_scale
    return layout.pad_rows(weights, layout.nv_cap, 1.0)


def compile_active_row_weights(layout, leaflet: str):
    """shared * trace combined weights (tilt_utils.py:227-235), or None."""
    shared = compile_shared_rim_row_weights(layout, leaflet)
    trace = compile_trace_layer_row_weights(layout)
    if shared is None:
        return trace
    if trace is None:
        return shared
    return shared * trace


def row_weights(topo, leaflet: str):
    return topo.extras.get(f"energy:tilt_{leaflet}/row_weights")


def leaflet_energy(geo, tilts, topo, k_tilt, mass_mode: str, present_tri=None, weights=None):
    if weights is not None:
        tilts = tilts * weights[:, None]
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
            geo,
            tilts,
            topo,
            k,
            mass_mode,
            present_triangles(topo, leaflet),
            weights=row_weights(topo, leaflet),
        )

    return fn


def make_leaflet_inloop_energy(spec, leaflet: str):
    """Relax-loop energy: the reference's magnitude-penalty fast path.

    See :func:`make_leaflet_tilt_frozen` — same semantics (always lumped,
    no row weights, present-mask for the outer leaflet only), in the
    unfrozen ``fn(geo, state, topo, params)`` form used by
    ``tilt_relax.make_tilt_energy`` when no frozen program is available.
    """

    def fn(geo, state, topo, params):
        from membrane_solver_tpu.energy.leaflet_presence import present_triangles

        k = params.get(f"tilt_modulus_{leaflet}", jnp.asarray(0.0))
        tilts = state.tilts_in if leaflet == "in" else state.tilts_out
        present = present_triangles(topo, "out") if leaflet == "out" else None
        return leaflet_energy(geo, tilts, topo, k, "lumped", present, weights=None)

    return fn


def make_leaflet_tilt_frozen(spec, leaflet: str):
    """Frozen split for the inner tilt solve (positions constant).

    IN-LOOP SEMANTICS — this is deliberately NOT the clean module energy.
    The reference's inner relax always passes precomputed barycentric vertex
    areas, which routes tilt_in/tilt_out through the evaluation manager's
    magnitude-penalty fast path (evaluation_manager.py:561-575 energies,
    658-691 gradients): E = 1/2 k sum_v |t_v|^2 A_v with

      * LUMPED mass always — ``tilt_mass_mode_* = consistent`` is silently
        bypassed in-loop (the clean compute_energy/breakdown still honors
        it, so the relax descends a slightly different objective than the
        score; measured 3.05e-4 on the i50 interface lane entry state);
      * NO active-row/trace-layer weights (module-internal machinery the
        fast path never reaches);
      * areas: inner leaflet = barycentric over ALL triangles, outer
        leaflet = leaflet-present triangles only
        (tilt_relaxation.py:668-697).

    precompute() bakes those areas once per relax call; the per-iteration
    energy is just corner gathers + the quadratic form.
    """

    def precompute(state, topo, params):
        from membrane_solver_tpu.device import geo as dgeo
        from membrane_solver_tpu.energy.leaflet_presence import present_triangles

        geo = dgeo.triangle_geometry(state.positions, topo.tri_rows, topo.tri_valid)
        area = geo.area
        if leaflet == "out":
            present = present_triangles(topo, "out")
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
        coeff = 0.5 * k_tilt * (sq / 3.0)
        return jnp.sum(coeff * fr["area"])

    return precompute, energy

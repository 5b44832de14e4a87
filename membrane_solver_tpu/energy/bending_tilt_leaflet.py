"""Leaflet bending-tilt coupling core: E = 1/2 sum kappa (2H - c0 + s*div t)^2 dA.

Parity: reference ``modules/energy/bending_tilt_leaflet.py`` (default modes):

Energy value + tilt gradient use the per-corner form

    base_term_v = 2 H_v - c0_v           (zeroed on boundary rows)
    div_tri     = div_sign * P1 divergence of the leaflet tilt field
    E = 0.5 * sum_tri sum_corner kappa_corner (base_corner + div_tri)^2 va_eff_corner

while the SHAPE gradient is the reference's analytic backprop
(bt_gradient.py), which is the exact gradient of the *vertex-averaged*
surrogate with the divergence frozen:

    div_eff_v = sum(va_eff_corner * div_tri) / A_eff_v          (held constant)
    E_shape(x) = 0.5 * sum_v kappa_v (base_v(x) + div_eff_v)^2 A_eff_v(x)
    term zeroed on non-interior rows; |K| differentiated with the vertex-normal
    fallback at K = 0 (device/geo.directional_norm).

Both behaviors are realized in one expression via stop_gradient composition:
value/tilt-grad from the corner form (positions frozen), shape-grad from the
surrogate (tilt-derived divergence frozen), with the surrogate's raw value
cancelled.  H_v = |K_v| / (2 max(A_vor, 1e-12)); va_eff are the boundary-
redistributed mixed-Voronoi corner areas (bending_utils.py:136-170).
div_sign = -1 inner / +1 outer (bending_tilt_in.py / bending_tilt_out.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from membrane_solver_tpu.device import geo as dgeo
from membrane_solver_tpu.device.tilt_ops import p1_triangle_divergence

USES_TILT_LEAFLETS = True


def _redistributed_va(corner_areas, topo, keep):
    """Boundary-redistributed mixed-Voronoi corner areas, keep-masked."""
    va = corner_areas
    tri_is_b = topo.boundary_vertex_mask[topo.tri_rows]
    interior_c = ~tri_is_b
    n_int = jnp.sum(interior_c, axis=1)
    redistribute = (n_int > 0) & jnp.any(tri_is_b, axis=1)
    b_sum = jnp.sum(jnp.where(tri_is_b, va, 0.0), axis=1)
    extra = jnp.where(redistribute, b_sum / jnp.maximum(n_int, 1), 0.0)
    va_eff = jnp.where(
        redistribute[:, None], jnp.where(interior_c, va + extra[:, None], 0.0), va
    )
    return jnp.where(keep[:, None], va_eff, 0.0)


def _fields(positions, topo, params, kappa_key, c0_key, tri_present=None):
    """Full-value leaflet fields: (base, va_eff, a_eff, kappa, interior, extra).

    Parity: reference bt_payload._leaflet_triangle_payload + the field prep
    in bending_tilt_leaflet.py:430-530 — k_vecs and Voronoi vertex areas
    come from the FULL mesh (compute_curvature_data, bt_payload.py:95-97);
    only the per-triangle corner areas / operators are filtered to the
    kept (leaflet-present) triangles.  ``extra`` carries the curvature
    intermediates the shape-gradient surrogate needs.
    """
    n_rows = positions.shape[0]
    keep = topo.tri_valid if tri_present is None else (topo.tri_valid & tri_present)
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, keep)
    # K_dir/|K| fallback normals come from the KEPT triangle fan
    # (reference _vertex_normals(mesh, positions, tri_rows) with tri_rows
    # already filtered)
    vnormals = dgeo.vertex_normals(geo, topo.tri_rows, keep, n_rows)
    curv = dgeo.curvature_data(positions, topo.tri_rows, topo.tri_valid, n_rows)
    safe_vor = jnp.maximum(curv.vertex_areas, 1e-12)
    H = dgeo.directional_norm(curv.k_vecs, vnormals) / (2.0 * safe_vor)

    kappa = params.get(kappa_key, params.get("bending_modulus", jnp.asarray(0.0)))
    c0 = params.get(
        c0_key,
        params.get("spontaneous_curvature", params.get("intrinsic_curvature", jnp.asarray(0.0))),
    )
    interior = topo.vertex_valid & ~topo.boundary_vertex_mask
    base_term = jnp.where(interior, 2.0 * H - c0, 0.0)

    va_eff = _redistributed_va(curv.corner_areas, topo, keep)
    a_eff = dgeo.scatter_add_rows(
        va_eff[:, 0], va_eff[:, 1], va_eff[:, 2], topo.tri_rows, n_rows
    )
    extra = {
        "H": H,
        "safe_vor": safe_vor,
        "k_vecs": curv.k_vecs,
        "vnormals": vnormals,
        "keep": keep,
    }
    return base_term, va_eff, a_eff, kappa, interior, extra


def recovered_divergence(div_term, positions, topo):
    """Theory-mode inner divergence smoothing (barycentric recovery).

    Parity: reference ``modules/energy/bt_divergence.py:57-117``
    (_inner_recovered_divergence) — vertex values recovered with w = A/3
    area weights, averaged back to triangles.  A linear operator, so JAX AD
    of this expression reproduces the reference's analytic pullback
    (bt_divergence.py:119-160) exactly.
    """
    geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
    w = jnp.where(topo.tri_valid, geo.area / 3.0, 0.0)
    n_rows = positions.shape[0]
    v_area = dgeo.scatter_add_rows(w, w, w, topo.tri_rows, n_rows)
    wd = w * div_term
    v_num = dgeo.scatter_add_rows(wd, wd, wd, topo.tri_rows, n_rows)
    v_div = jnp.where(v_area > 1e-20, v_num / jnp.maximum(v_area, 1e-20), 0.0)
    return jnp.mean(v_div[topo.tri_rows], axis=1)


def _apply_base_overrides(base_term, zero_base, j0_mask):
    """Theory-mode base-term overrides (bt_params/bt_selection parity).

    zero_base: ``bending_tilt_base_term_reference_mode=flat_reference_zero_J0``
    zeroes the Helfrich base everywhere; j0_mask: rows of
    ``bending_tilt_assume_J0_presets`` vertices get base = 0.
    """
    if zero_base:
        base_term = jnp.zeros_like(base_term)
    elif j0_mask is not None:
        base_term = jnp.where(j0_mask, 0.0, base_term)
    return base_term


def _tri_cap_masks(positions, topo, params, center):
    """Rim/outer-near triangle bands about the J0 center (bt_selection.py:70-77)."""
    dtype = positions.dtype
    radius = params.get("benchmark_disk_radius", jnp.asarray(0.0, dtype))
    lam = params.get("benchmark_lambda_value", jnp.asarray(0.0, dtype))
    tri_xy = jnp.mean(positions[topo.tri_rows][:, :, :2], axis=1) - center[None, :]
    tri_r = jnp.linalg.norm(tri_xy, axis=1)
    rim_m = (jnp.abs(tri_r - radius) <= lam) & topo.tri_valid
    near_m = (tri_r > radius + lam) & (tri_r <= radius + 4.0 * lam) & topo.tri_valid
    active = (radius > 0.0) & (lam > 0.0)
    return rim_m & active, near_m & active


def _apply_divergence_cap(div_term, rim_m, near_m):
    """outer_near_divergence_cap_v1 (bt_selection.py:78-95): outer-near
    triangles clip |div| to 1.05x the median rim |div|; straight-through
    (the reference applies dE/ddiv at the capped value with the cap
    treated as data)."""
    sg = jax.lax.stop_gradient
    v = jnp.where(rim_m, jnp.abs(div_term), jnp.inf)
    v = jnp.sort(v)
    n = jnp.sum(rim_m.astype(jnp.int32))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = jnp.where(n > 0, 0.5 * (v[lo] + v[hi]), 0.0)
    cap = sg(1.05 * med)
    hit = near_m & (jnp.abs(div_term) > cap)
    capped = jnp.where(hit, jnp.sign(div_term) * cap, div_term)
    out = div_term + sg(capped - div_term)
    return jnp.where((cap > 0.0) & jnp.any(near_m) & (n > 0), out, div_term)


def leaflet_bending_tilt_energy(
    state, topo, params, *, tilts, kappa_key: str, div_sign: float, c0_key: str,
    tri_present=None, zero_base=False, j0_mask=None, recovered_div=False,
    update_mode="off", idiv_masks=None, stencil_trace=None,
):
    positions = state.positions
    if stencil_trace is not None:
        # trace_boundary_v1 (reference bending_tilt_leaflet.py:190-225):
        # this module contributes NO z shape-gradient on the scaffold
        # trace rows — stop the z gradient there (value unchanged)
        z = positions[:, 2]
        z_eff = jnp.where(stencil_trace, jax.lax.stop_gradient(z), z)
        positions = positions.at[:, 2].set(z_eff)
    frozen_x = jax.lax.stop_gradient(positions)
    n_rows = positions.shape[0]

    # --- corner form at frozen positions: value + exact tilt gradient -----
    base_f, va_eff_f, a_eff_f, kappa, interior, _xf = _fields(
        frozen_x, topo, params, kappa_key, c0_key, tri_present
    )
    base_f = _apply_base_overrides(base_f, zero_base, j0_mask)
    div_tri, _, _ = p1_triangle_divergence(frozen_x, tilts, topo.tri_rows, topo.tri_valid)
    div_term = div_sign * div_tri
    if idiv_masks is not None:
        div_term = _reconstruct_trace_divergence(div_term, topo, *idiv_masks)
    if update_mode == "outer_near_divergence_cap_v1":
        center = topo.extras["energy:bending_tilt_in/update_center"].astype(
            positions.dtype
        )
        rim_m, near_m = _tri_cap_masks(frozen_x, topo, params, center)
        div_term = _apply_divergence_cap(div_term, rim_m, near_m)
    if recovered_div:
        div_term = recovered_divergence(div_term, frozen_x, topo)
    base_c = base_f[topo.tri_rows]
    keep = topo.tri_valid if tri_present is None else (topo.tri_valid & tri_present)
    if update_mode == "radial_cross_term_off_v1":
        # same VALUE as (base+div)^2, but the tilt gradient drops the
        # base cross term: dE/ddiv = kappa*div*va (bt_divergence.py:42-49)
        sg = jax.lax.stop_gradient
        sqs = (
            base_c**2
            + (div_term**2)[:, None]
            + 2.0 * base_c * sg(div_term)[:, None]
        )
    else:
        term_c = base_c + div_term[:, None]
        sqs = term_c**2
    corner = 0.5 * jnp.sum(
        jnp.where(keep, kappa * jnp.sum(sqs * va_eff_f, axis=1), 0.0)
    )

    # --- vertex-form surrogate: shape gradient with frozen divergence ------
    div_eff_num = dgeo.scatter_add_rows(
        va_eff_f[:, 0] * div_term,
        va_eff_f[:, 1] * div_term,
        va_eff_f[:, 2] * div_term,
        topo.tri_rows,
        n_rows,
    )
    div_eff = jax.lax.stop_gradient(
        jnp.where(a_eff_f > 1e-20, div_eff_num / jnp.maximum(a_eff_f, 1e-20), 0.0)
    )
    # Adjoint-form surrogate.  Reference analytic backprop
    # (bt_gradient.py:20-280): the coefficient VALUES use the full-mesh
    # curvature (factor_K_vec = kappa*term*ratio*K_dir, fA_eff, fA_vor with
    # H/A_vor from compute_curvature_data on ALL triangles) while the
    # gradient OPERATORS (Beltrami + cotan variation + mixed-Voronoi area
    # variation) run over the KEPT (leaflet-present) triangles only.  The AD
    # equivalent: stop-gradient coefficients contracted with kept-submesh
    # position-dependent fields; chain rule makes this identical to AD of
    # the vertex surrogate when kept == full.
    base_x, _va_x, a_eff_x, kappa_x, interior_x, xf = _fields(
        positions, topo, params, kappa_key, c0_key, tri_present
    )
    base_x = _apply_base_overrides(base_x, zero_base, j0_mask)
    term_v = jnp.where(interior_x & topo.vertex_valid, base_x + div_eff, 0.0)
    sg = jax.lax.stop_gradient
    ratio = jnp.where(xf["safe_vor"] > 1e-15, a_eff_x / xf["safe_vor"], 0.0)
    k_mag = jnp.linalg.norm(xf["k_vecs"], axis=1)
    # dtype-aware kink threshold: in f32 the flat-state |K| is cancellation
    # noise ~1e-7..1e-6, so the reference's 1e-15 picked the NOISE direction
    # for K_dir and the stop-gradient coefficient below injected O(1) error
    # into the shape gradient (round-5 f32-parity fix; dgeo.kink_threshold)
    k_thresh = dgeo.kink_threshold(k_mag.dtype)
    k_dir = jnp.where(
        (k_mag > k_thresh)[:, None],
        xf["k_vecs"] / jnp.maximum(k_mag, k_thresh)[:, None],
        xf["vnormals"],
    )
    coef_K = sg((kappa_x * term_v * ratio)[:, None] * k_dir)
    coef_a_eff = sg(0.5 * kappa_x * term_v**2)
    coef_a_vor = sg(-2.0 * kappa_x * term_v * ratio * xf["H"])

    keep_x = xf["keep"]
    curv_k = dgeo.curvature_data(positions, topo.tri_rows, keep_x, n_rows)
    va_k = _redistributed_va(curv_k.corner_areas, topo, keep_x)
    a_eff_k = dgeo.scatter_add_rows(
        va_k[:, 0], va_k[:, 1], va_k[:, 2], topo.tri_rows, n_rows
    )
    surrogate = (
        jnp.sum(coef_K * curv_k.k_vecs)
        + jnp.sum(coef_a_eff * a_eff_k)
        + jnp.sum(coef_a_vor * curv_k.vertex_areas)
    )

    return corner + surrogate - jax.lax.stop_gradient(surrogate)


def static_modes(spec, leaflet: str):
    """(zero_base, recovered_div) static switches for one leaflet.

    Parity: reference bt_params.py — flat_reference_zero_J0 zeroes the base
    term; a non-empty ``theory_parity_lane`` turns on the recovered inner
    divergence for the in-leaflet only (bt_params._use_inner_recovered_
    divergence).
    """
    mode = spec.option(
        f"bending_tilt_base_term_reference_mode_{leaflet}",
        spec.option("bending_tilt_base_term_reference_mode", "current_geometry"),
    )
    zero_base = str(mode).strip().lower() == "flat_reference_zero_j0"
    recovered = leaflet == "in" and bool(spec.option("theory_parity_lane", "").strip())
    return zero_base, recovered


def interface_divergence_mode_static(spec, leaflet: str) -> str:
    """Scaffold-interface divergence reconstruction mode (bt_params.py:107-127)."""
    raw = spec.option(f"bending_tilt_interface_divergence_mode_{leaflet}", "")
    if not raw and leaflet == "out":
        raw = spec.option("bending_tilt_out_interface_divergence_mode", "")
    if not raw:
        raw = spec.option("bending_tilt_interface_divergence_mode", "p1_triangle")
    mode = raw.strip().lower()
    if mode not in {"p1_triangle", "trace_reconstructed_v1"}:
        raise ValueError(
            "bending_tilt_out_interface_divergence_mode must be "
            "'p1_triangle' or 'trace_reconstructed_v1'."
        )
    return mode


def stencil_mode_static(spec) -> str:
    """Opt-in scaffold trace treatment for inner shape gradients
    (bt_params.py:129-141)."""
    mode = spec.option("bending_tilt_in_scaffold_shape_stencil_mode", "off").strip().lower()
    if mode not in {"off", "trace_boundary_v1"}:
        raise ValueError(
            "bending_tilt_in_scaffold_shape_stencil_mode must be "
            "'off' or 'trace_boundary_v1'."
        )
    return mode


def compile_scaffold_row_masks(layout):
    """(trace, support, release) row masks for scaffold-trace modes.

    Parity: reference bending_tilt_leaflet._row_option_mask selections
    (:88-99, 170-179) — pin_to_circle_group == 'trace_layer',
    outer_shell_scaffold_index set, outer_shell_release_ring truthy.
    """
    import numpy as np

    mesh = layout.mesh
    n = len(layout.vertex_ids)
    trace = np.zeros(n, dtype=bool)
    support = np.zeros(n, dtype=bool)
    release = np.zeros(n, dtype=bool)
    for vid, vertex in mesh.vertices.items():
        row = layout.row_of.get(int(vid))
        if row is None:
            continue
        opts = getattr(vertex, "options", None) or {}
        if str(opts.get("pin_to_circle_group") or "") == "trace_layer":
            trace[row] = True
        if opts.get("outer_shell_scaffold_index") is not None:
            support[row] = True
        if bool(opts.get("outer_shell_release_ring", False)):
            release[row] = True
    return (
        layout.pad_rows(trace, layout.nv_cap, False),
        layout.pad_rows(support, layout.nv_cap, False),
        layout.pad_rows(release, layout.nv_cap, False),
    )


def _reconstruct_trace_divergence(div_term, topo, tr, su, rl):
    """trace_reconstructed_v1 (reference bending_tilt_leaflet.py:75-135):
    triangles touching trace rows take the mean divergence of the
    non-scaffold source triangles (fallback: support-touching,
    non-trace)."""
    rows = topo.tri_rows
    trace_touch = jnp.any(tr[rows], axis=1) & topo.tri_valid
    support_touch = jnp.any(su[rows], axis=1) & topo.tri_valid
    release_touch = jnp.any(rl[rows], axis=1) & topo.tri_valid
    scaffold_touch = trace_touch | support_touch | release_touch
    src1 = (~scaffold_touch) & topo.tri_valid
    src2 = support_touch & ~trace_touch
    use1 = jnp.any(src1)
    source = jnp.where(use1, src1, src2)
    n_src = jnp.sum(source.astype(div_term.dtype))
    mean = jnp.sum(jnp.where(source, div_term, 0.0)) / jnp.maximum(n_src, 1.0)
    enabled = (
        jnp.any(tr)
        & (jnp.any(su) | jnp.any(rl))
        & jnp.any(trace_touch)
        & (n_src > 0)
    )
    rec = jnp.where(enabled & trace_touch, mean, div_term)
    # straight-through: the reference's pullback applies dE/ddiv at the
    # reconstructed value to each triangle's own corners, without
    # propagating through the source mean (bending_tilt_leaflet.py:390)
    return div_term + jax.lax.stop_gradient(rec - div_term)


def update_mode_static(spec, leaflet: str) -> str:
    """Benchmark-scoped inner update mode (bt_params.py:156-174); in-only."""
    if leaflet != "in":
        return "off"
    mode = spec.option("bending_tilt_in_update_mode", "off").strip().lower()
    if mode not in {"off", "outer_near_divergence_cap_v1", "radial_cross_term_off_v1"}:
        raise ValueError(
            "bending_tilt_in_update_mode must be 'off' or "
            "'outer_near_divergence_cap_v1' or 'radial_cross_term_off_v1'."
        )
    return mode


def assume_J0_center_xy(gp):
    """xy center for radial clipping (reference bt_params.py:60-72):
    tilt_thetaB_center, falling back to pin_to_circle_point, else origin."""
    import numpy as np

    raw = gp.get("tilt_thetaB_center")
    if raw is None:
        raw = gp.get("pin_to_circle_point")
    if raw is None:
        return np.zeros(2)
    arr = np.asarray(raw, dtype=float).reshape(-1)
    return arr[:2] if arr.size >= 2 else np.zeros(2)


def combined_zero_mask(topo, leaflet: str):
    """assume-J0 preset rows plus benchmark base-term region rows."""
    j0 = topo.extras.get(f"energy:bending_tilt_{leaflet}/assume_J0")
    region = topo.extras.get(f"energy:bending_tilt_{leaflet}/region_zero")
    if region is None:
        return j0
    if j0 is None:
        return region
    return j0 | region


def compile_assume_J0(layout, leaflet: str):
    """Compile hook: padded bool mask of assume-J0 preset vertex rows.

    Parity: reference bt_selection._collect_preset_rows — vertices whose
    ``options.preset`` is in ``bending_tilt_assume_J0_presets[_tag]``, with
    the optional ``..._radius_max`` xy-radius clip about tilt_thetaB_center
    (positions at topology-compile time, matching the reference's
    vertex-version-keyed cache).
    """
    import numpy as np

    mesh = layout.mesh
    gp = mesh.global_parameters
    raw = gp.get(f"bending_tilt_assume_J0_presets_{leaflet}")
    if raw is None:
        raw = gp.get("bending_tilt_assume_J0_presets")
    if raw is None:
        return {}
    presets = {str(x).strip() for x in ([raw] if isinstance(raw, str) else raw)}
    presets.discard("")
    radius_raw = gp.get(f"bending_tilt_assume_J0_presets_radius_max_{leaflet}")
    if radius_raw is None:
        radius_raw = gp.get("bending_tilt_assume_J0_presets_radius_max")
    radius_max = None if radius_raw is None else float(radius_raw)
    center_raw = gp.get("tilt_thetaB_center")
    if center_raw is None:
        center_raw = gp.get("pin_to_circle_point")
    center = np.zeros(2)
    if center_raw is not None:
        arr = np.asarray(center_raw, dtype=float).reshape(-1)
        if arr.size >= 2:
            center = arr[:2]
    mask = np.zeros(len(layout.vertex_ids), dtype=bool)
    for vid, vertex in mesh.vertices.items():
        opts = getattr(vertex, "options", None) or {}
        if str(opts.get("preset") or "") not in presets:
            continue
        row = layout.row_of.get(int(vid))
        if row is None:
            continue
        if radius_max is not None:
            pos = np.asarray(vertex.position, dtype=float)
            if float(np.linalg.norm(pos[:2] - center)) > radius_max + 1e-12:
                continue
        mask[row] = True
    return {"assume_J0": layout.pad_rows(mask, layout.nv_cap, False)}


def make_leaflet_bending_tilt_frozen(
    spec, *, leaflet: str, kappa_key: str, div_sign: float, c0_key: str
):
    """Frozen split for the inner tilt solve (positions constant).

    The surrogate term of :func:`leaflet_bending_tilt_energy` contributes
    exactly zero value (it cancels against its own stop_gradient) and zero
    tilt gradient (its only tilt input is stop-gradiented), so the frozen
    per-iteration energy is the corner form alone, with every position-only
    field (base term, effective corner areas, P1 shape gradients) baked once
    per relax call.  Identical arithmetic to the full path on the
    tilt-dependent part — values and tilt gradients match exactly.
    """

    zero_base, recovered = static_modes(spec, leaflet)
    upd_mode = update_mode_static(spec, leaflet)
    idiv_on = (
        leaflet == "out"
        and interface_divergence_mode_static(spec, "out") == "trace_reconstructed_v1"
    )
    j0_key = f"energy:bending_tilt_{leaflet}/assume_J0"

    def precompute(state, topo, params):
        from membrane_solver_tpu.energy.leaflet_presence import present_triangles

        positions = state.positions
        tri_present = present_triangles(topo, leaflet)
        base_f, va_eff_f, _a_eff_f, _kappa, _interior, _xf = _fields(
            positions, topo, params, kappa_key, c0_key, tri_present
        )
        base_f = _apply_base_overrides(
            base_f, zero_base, combined_zero_mask(topo, leaflet)
        )
        geo = dgeo.triangle_geometry(positions, topo.tri_rows, topo.tri_valid)
        g = dgeo.p1_shape_gradients(geo)
        keep = topo.tri_valid if tri_present is None else (topo.tri_valid & tri_present)
        out = {
            "base_c": base_f[topo.tri_rows],
            "va_eff": va_eff_f,
            "g": g,
            "keep": keep,
        }
        if upd_mode == "outer_near_divergence_cap_v1":
            center = topo.extras["energy:bending_tilt_in/update_center"].astype(
                positions.dtype
            )
            rim_m, near_m = _tri_cap_masks(positions, topo, params, center)
            out["cap_rim"] = rim_m
            out["cap_near"] = near_m
        if recovered:
            # barycentric-recovery smoothing weights (positions constant)
            w = jnp.where(topo.tri_valid, geo.area / 3.0, 0.0)
            v_area = dgeo.scatter_add_rows(
                w, w, w, topo.tri_rows, positions.shape[0]
            )
            out["smooth_w"] = w
            out["smooth_inv_varea"] = jnp.where(
                v_area > 1e-20, 1.0 / jnp.maximum(v_area, 1e-20), 0.0
            )
        return out

    def energy(tin, tout, fr, topo, params, ctx=None):
        kappa = params.get(kappa_key, params.get("bending_modulus", jnp.asarray(0.0)))
        g = fr["g"]
        if ctx is not None:
            corners = ctx["tin_c"] if leaflet == "in" else ctx["tout_c"]
            t0, t1, t2 = corners[:, 0], corners[:, 1], corners[:, 2]
        else:
            tilts = tin if leaflet == "in" else tout
            t0 = tilts[topo.tri_rows[:, 0]]
            t1 = tilts[topo.tri_rows[:, 1]]
            t2 = tilts[topo.tri_rows[:, 2]]
        div = (
            jnp.sum(t0 * g[:, 0], axis=1)
            + jnp.sum(t1 * g[:, 1], axis=1)
            + jnp.sum(t2 * g[:, 2], axis=1)
        )
        div = jnp.where(topo.tri_valid, div, 0.0)
        div = div_sign * div
        if idiv_on:
            div = _reconstruct_trace_divergence(
                div,
                topo,
                topo.extras["energy:bending_tilt_out/scaffold_trace"],
                topo.extras["energy:bending_tilt_out/scaffold_support"],
                topo.extras["energy:bending_tilt_out/scaffold_release"],
            )
        if upd_mode == "outer_near_divergence_cap_v1":
            div = _apply_divergence_cap(div, fr["cap_rim"], fr["cap_near"])
        if recovered:
            wd = fr["smooth_w"] * div
            n_rows = fr["smooth_inv_varea"].shape[0]
            v_num = dgeo.scatter_add_rows(wd, wd, wd, topo.tri_rows, n_rows)
            v_div = v_num * fr["smooth_inv_varea"]
            div = jnp.mean(v_div[topo.tri_rows], axis=1)
        if upd_mode == "radial_cross_term_off_v1":
            sg = jax.lax.stop_gradient
            sqs = (
                fr["base_c"] ** 2
                + (div**2)[:, None]
                + 2.0 * fr["base_c"] * sg(div)[:, None]
            )
        else:
            term_c = fr["base_c"] + div[:, None]
            sqs = term_c**2
        return 0.5 * jnp.sum(
            jnp.where(fr["keep"], kappa * jnp.sum(sqs * fr["va_eff"], axis=1), 0.0)
        )

    return precompute, energy


def compile_base_term_region_zero(layout, leaflet: str):
    """Benchmark-scoped base-term region zero mask, or None.

    Parity: reference bt_selection._base_term_region_zero_rows
    (bt_selection.py:230-287) — ``physical_disk_split_v1`` zeroes the OUT
    leaflet's Helfrich base inside the disk (xy-radius <= region radius
    about the J0 center); ``disk_only_base_term_v1`` zeroes the IN
    leaflet's base outside it.  Rows resolve from topology-compile-time
    positions, matching the reference's vertex-version-keyed cache.
    """
    import numpy as np

    gp = layout.mesh.global_parameters
    mode = str(gp.get("bending_tilt_base_term_region_mode") or "off").strip().lower()
    if mode == "off":
        return None
    if mode not in {"physical_disk_split_v1", "disk_only_base_term_v1"}:
        raise ValueError(
            "bending_tilt_base_term_region_mode must be 'off' or "
            "'physical_disk_split_v1' or 'disk_only_base_term_v1'."
        )
    if mode == "physical_disk_split_v1" and leaflet != "out":
        return None
    if mode == "disk_only_base_term_v1" and leaflet != "in":
        return None
    radius_raw = gp.get("bending_tilt_base_term_region_radius")
    if radius_raw is None:
        raise ValueError(
            "bending_tilt_base_term_region_radius is required when "
            "bending_tilt_base_term_region_mode is enabled."
        )
    radius = float(radius_raw)
    center_raw = gp.get("tilt_thetaB_center")
    if center_raw is None:
        center_raw = gp.get("pin_to_circle_point")
    center = np.zeros(2)
    if center_raw is not None:
        arr = np.asarray(center_raw, dtype=float).reshape(-1)
        if arr.size >= 2:
            center = arr[:2]
    mesh = layout.mesh
    mask = np.zeros(len(layout.vertex_ids), dtype=bool)
    for row, vid in enumerate(layout.vertex_ids):
        pos = np.asarray(mesh.vertices[int(vid)].position, dtype=float)
        r = float(np.linalg.norm(pos[:2] - center))
        if mode == "physical_disk_split_v1":
            mask[row] = r <= radius + 1.0e-12
        else:
            mask[row] = r > radius + 1.0e-12
    return layout.pad_rows(mask, layout.nv_cap, False)

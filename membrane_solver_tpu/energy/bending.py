"""Helfrich / Willmore bending energy on the cotan Laplacian.

Parity: reference ``modules/energy/bending.py`` + ``bending_utils.py``:

    H_v      = |K_v| / (2 * max(A_vor_v, 1e-12))          (integrated mean-
               curvature vector K and mixed-Voronoi area per Meyer 2003)
    helfrich: E = 0.5 * sum_v kappa_v (2 H_v - c0_v)^2 A_eff_v
    willmore: E = sum_v kappa_v H_v^2 A_eff_v

with the curvature term zeroed on boundary vertices and *effective* areas
A_eff that redistribute boundary corners' mixed-area contributions equally to
the interior corners of each triangle (bending_utils.py:136-170).

Per-vertex overrides: ``bending_modulus`` and ``spontaneous_curvature`` /
``intrinsic_curvature`` vertex options (bending_params.py:41-115) compile to
dense arrays.

Gradient: `jax.grad` through this energy — the reference's "analytic" mode is
a hand-written backprop of the same expression (bending_gradient.py), so the
gradients agree; "approx" (Beltrami-apply) and "finite_difference" modes exist
in the reference for debugging and are intentionally not replicated on the hot
path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from membrane_solver_tpu.device import geo as dgeo

USES_TILT = False
USES_TILT_LEAFLETS = False


def compile_topology(layout) -> dict:
    """Per-vertex kappa / c0 override tables."""
    mesh = layout.mesh
    n = len(layout.vertex_ids)
    has_kappa = np.zeros(n, dtype=bool)
    kappa = np.zeros(n)
    has_c0 = np.zeros(n, dtype=bool)
    c0 = np.zeros(n)
    for vid, vertex in mesh.vertices.items():
        row = layout.row_of[int(vid)]
        opts = vertex.options or {}
        if "bending_modulus" in opts:
            try:
                kappa[row] = float(opts["bending_modulus"])
                has_kappa[row] = True
            except (TypeError, ValueError):
                pass
        c0_val = opts.get("spontaneous_curvature", opts.get("intrinsic_curvature"))
        if c0_val is not None:
            try:
                c0[row] = float(c0_val)
                has_c0[row] = True
            except (TypeError, ValueError):
                pass
    pad = layout.pad_rows
    return {
        "has_kappa": pad(has_kappa, layout.nv_cap, False),
        "kappa": pad(kappa, layout.nv_cap, 0.0),
        "has_c0": pad(has_c0, layout.nv_cap, False),
        "c0": pad(c0, layout.nv_cap, 0.0),
    }


def effective_vertex_areas(curv: dgeo.CurvatureData, topo, n_rows: int) -> jnp.ndarray:
    """Mixed-Voronoi areas with boundary corners redistributed to interior ones."""
    va = curv.corner_areas  # (F, 3)
    tri_is_b = topo.boundary_vertex_mask[topo.tri_rows]  # (F, 3) bool
    interior = ~tri_is_b
    n_interior = jnp.sum(interior, axis=1)
    redistribute = (n_interior > 0) & jnp.any(tri_is_b, axis=1)
    b_sum = jnp.sum(jnp.where(tri_is_b, va, 0.0), axis=1)
    extra = jnp.where(redistribute, b_sum / jnp.maximum(n_interior, 1), 0.0)
    va_eff = jnp.where(
        redistribute[:, None],
        jnp.where(interior, va + extra[:, None], 0.0),
        va,
    )
    return dgeo.scatter_add_rows(
        va_eff[:, 0], va_eff[:, 1], va_eff[:, 2], topo.tri_rows, n_rows
    )


def bending_fields(state, topo):
    """(H_vor, A_vor, A_eff, interior mask) shared with tilt-coupled modules."""
    n_rows = state.positions.shape[0]
    geo = dgeo.triangle_geometry(state.positions, topo.tri_rows, topo.tri_valid)
    vnormals = dgeo.vertex_normals(geo, topo.tri_rows, topo.tri_valid, n_rows)
    curv = dgeo.curvature_data(state.positions, topo.tri_rows, topo.tri_valid, n_rows)
    safe_vor = jnp.maximum(curv.vertex_areas, 1e-12)
    # |K| with normal-direction gradient fallback at flat states
    H = dgeo.directional_norm(curv.k_vecs, vnormals) / (2.0 * safe_vor)
    a_eff = effective_vertex_areas(curv, topo, n_rows)
    interior = topo.vertex_valid & ~topo.boundary_vertex_mask
    return H, curv, a_eff, interior


def make_energy(spec):
    """Specialize on the static bending_energy_model global parameter."""
    model = spec.option("bending_energy_model", "helfrich").lower()
    model = "helfrich" if model == "helfrich" else "willmore"

    def fn(geo, state, topo, params):
        return energy(geo, state, topo, params, model=model)

    return fn


def energy(geo, state, topo, params, model: str | None = None):
    default_kappa = params.get("bending_modulus", jnp.asarray(0.0))
    kappa = jnp.where(
        topo.extras["energy:bending/has_kappa"],
        topo.extras["energy:bending/kappa"],
        default_kappa,
    )
    default_c0 = params.get(
        "spontaneous_curvature", params.get("intrinsic_curvature", jnp.asarray(0.0))
    )
    c0 = jnp.where(
        topo.extras["energy:bending/has_c0"], topo.extras["energy:bending/c0"], default_c0
    )

    H, _curv, a_eff, interior = bending_fields(state, topo)
    if model is None:
        model = "helfrich"
    if model == "helfrich":
        term = jnp.where(interior, 2.0 * H - c0, 0.0)
        density = 0.5 * kappa * term**2
    else:
        H_eff = jnp.where(interior, H, 0.0)
        density = kappa * H_eff**2
    return jnp.sum(jnp.where(topo.vertex_valid, density * a_eff, 0.0))

"""Inner-leaflet bending-tilt coupling (kappa_key=bending_modulus_in, div_sign=-1).

Parity: reference ``modules/energy/bending_tilt_in.py``.
"""

from __future__ import annotations

from membrane_solver_tpu.energy.bending_tilt_leaflet import (
    combined_zero_mask,
    leaflet_bending_tilt_energy,
)
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


def make_energy(spec):
    """Static-mode-aware energy (theory-parity base/divergence overrides)."""
    from membrane_solver_tpu.energy.bending_tilt_leaflet import static_modes

    from membrane_solver_tpu.energy.bending_tilt_leaflet import (
        stencil_mode_static,
        update_mode_static,
    )

    zero_base, recovered = static_modes(spec, "in")
    upd_mode = update_mode_static(spec, "in")
    stencil_on = stencil_mode_static(spec) == "trace_boundary_v1"

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
            j0_mask=combined_zero_mask(topo, "in"),
            recovered_div=recovered,
            update_mode=upd_mode,
            stencil_trace=(
                topo.extras.get("energy:bending_tilt_in/stencil_trace")
                if stencil_on
                else None
            ),
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
    # benchmark update-mode cap center (bt_params._assume_J0_center_xy)
    import numpy as np

    gp = layout.mesh.global_parameters
    mode = str(gp.get("bending_tilt_in_update_mode") or "off").strip().lower()
    if mode == "outer_near_divergence_cap_v1":
        from membrane_solver_tpu.energy.bending_tilt_leaflet import assume_J0_center_xy

        out["update_center"] = assume_J0_center_xy(gp)
    if (
        str(gp.get("bending_tilt_in_scaffold_shape_stencil_mode") or "off")
        .strip()
        .lower()
        == "trace_boundary_v1"
    ):
        from membrane_solver_tpu.energy.bending_tilt_leaflet import (
            compile_scaffold_row_masks,
        )

        tr, su, rl = compile_scaffold_row_masks(layout)
        # enabled only with trace rows AND scaffold rows present
        # (reference :213-215); compile the mask only when it will act
        if tr.any() and (su.any() or rl.any()):
            out["stencil_trace"] = tr
    return out

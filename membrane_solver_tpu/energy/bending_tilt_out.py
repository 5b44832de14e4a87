"""Outer-leaflet bending-tilt coupling (kappa_key=bending_modulus_out, div_sign=+1).

Parity: reference ``modules/energy/bending_tilt_out.py``.
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
        tilts=state.tilts_out,
        kappa_key="bending_modulus_out",
        div_sign=1.0,
        c0_key="spontaneous_curvature_out",
        tri_present=present_triangles(topo, "out"),
    )


def make_tilt_frozen(spec):
    """Frozen-geometry split for the inner tilt solve (positions constant)."""
    from membrane_solver_tpu.energy.bending_tilt_leaflet import (
        make_leaflet_bending_tilt_frozen,
    )

    return make_leaflet_bending_tilt_frozen(
        spec,
        leaflet="out",
        kappa_key="bending_modulus_out",
        div_sign=1.0,
        c0_key="spontaneous_curvature_out",
    )


def make_energy(spec):
    """Static-mode-aware energy (theory-parity base/divergence overrides)."""
    from membrane_solver_tpu.energy.bending_tilt_leaflet import static_modes

    from membrane_solver_tpu.energy.bending_tilt_leaflet import (
        interface_divergence_mode_static,
    )

    zero_base, recovered = static_modes(spec, "out")
    idiv_on = interface_divergence_mode_static(spec, "out") == "trace_reconstructed_v1"

    def fn(geo, state, topo, params):
        idiv_masks = None
        if idiv_on:
            idiv_masks = (
                topo.extras["energy:bending_tilt_out/scaffold_trace"],
                topo.extras["energy:bending_tilt_out/scaffold_support"],
                topo.extras["energy:bending_tilt_out/scaffold_release"],
            )
        return leaflet_bending_tilt_energy(
            state,
            topo,
            params,
            tilts=state.tilts_out,
            kappa_key="bending_modulus_out",
            div_sign=1.0,
            c0_key="spontaneous_curvature_out",
            tri_present=present_triangles(topo, "out"),
            zero_base=zero_base,
            j0_mask=combined_zero_mask(topo, "out"),
            recovered_div=recovered,
            idiv_masks=idiv_masks,
        )

    return fn


def compile_topology(layout):
    from membrane_solver_tpu.energy.bending_tilt_leaflet import (
        compile_assume_J0,
        compile_base_term_region_zero,
    )

    out = dict(compile_assume_J0(layout, "out"))
    region = compile_base_term_region_zero(layout, "out")
    if region is not None:
        out["region_zero"] = region
    gp = layout.mesh.global_parameters
    raw = (
        gp.get("bending_tilt_interface_divergence_mode_out")
        or gp.get("bending_tilt_out_interface_divergence_mode")
        or gp.get("bending_tilt_interface_divergence_mode")
    )
    if str(raw or "p1_triangle").strip().lower() == "trace_reconstructed_v1":
        from membrane_solver_tpu.energy.bending_tilt_leaflet import (
            compile_scaffold_row_masks,
        )

        tr, su, rl = compile_scaffold_row_masks(layout)
        out["scaffold_trace"] = tr
        out["scaffold_support"] = su
        out["scaffold_release"] = rl
    return out

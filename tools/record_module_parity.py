#!/usr/bin/env python3
"""Record per-module reference E/gradient fixtures for parity tests.

For every module listed below, runs the MOUNTED reference implementation
in isolation (an EvaluationManager with exactly one energy module) on a
seeded state and records:

- ``E``     total module energy,
- ``grad``  dense shape gradient,
- ``gin``/``gout`` leaflet tilt gradients (leaflet modules),
- ``gtilt`` single-field tilt gradient (USES_TILT modules).

Three lanes:
- ``kozlov``  the R12 hard-rim mesh with seeded leaflet tilts (tilt family,
  bending family, gaussian_curvature, surface);
- ``kozlov_vertex`` the same mesh with a seeded single ``tilt`` field
  (single-field tilt family);
- ``flat``    the meshgen flat_disk lane with tagged edges/vertices
  (jordan_area, edge_length_penalty, expression, line_tension).

Writes tests/fixtures/module_parity2/refmod2_<lane>_<module>.npz and the
seeded fields.  Pattern: the reference's own Fortran-vs-NumPy parity tests
(tests/test_fortran_kernels.py).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = os.environ.get("MEMBRANE_REFERENCE_ROOT", "/root/reference")
OUTDIR = REPO / "tests" / "fixtures" / "module_parity2"

sys.path.insert(0, str(REPO))

KOZLOV = os.path.join(REF, "benchmarks", "inputs", "bench_kozlov_1disk_profile_hard_rim_R12.yaml")

# gp overrides that switch every recorded module's modulus on
KOZLOV_GP = {
    "tilt_disk_target_group_in": "disk",
    "tilt_disk_target_group_out": "disk",
    "surface_tension": 0.7,
    "bending_modulus": 0.8,
    "spontaneous_curvature": 0.15,
    "gaussian_modulus": 0.6,
    "tilt_smoothness_modulus_in": 1.1,
    "tilt_smoothness_modulus_out": 1.2,
    "tilt_disk_target_strength_in": 0.5,
    "tilt_disk_target_theta_B_in": 0.2,
    "tilt_disk_target_strength_out": 0.4,
    "tilt_disk_target_theta_B_out": 0.1,
    "tilt_rim_source_group_out": "rim",
    "tilt_rim_source_strength_out": 0.35,
    "tilt_rim_source_group": "rim",
    "tilt_rim_source_strength": 0.25,
    "tilt_modulus": 0.9,
    "tilt_smoothness_modulus": 0.65,
    # single-field family moduli (reference key names)
    "tilt_rigidity": 0.9,
    "tilt_smoothness_rigidity": 0.65,
    # rim sources iterate rim edges per the edge mode
    "tilt_rim_source_edge_mode": "all",
    # make the thetaB contact term non-degenerate
    "tilt_thetaB_value": 0.27,
    "tilt_thetaB_contact_penalty_mode": "legacy",
    # curved local-interface family on the shell family near r=R
    "curved_local_interface_law_strength": 0.8,
    "curved_local_interface_penalty_strength": 0.7,
}


def tag_disk_targets(mesh) -> None:
    """Tag the disk-group vertices for the tilt_disk_target modules (the
    R12 fixture tags rim_slope_match_group but not the target groups)."""
    for v in mesh.vertices.values():
        opts = getattr(v, "options", None) or {}
        if str(opts.get("rim_slope_match_group") or "") == "disk":
            opts["tilt_disk_target_group_in"] = "disk"
            opts["tilt_disk_target_group_out"] = "disk"
            v.options = opts

KOZLOV_MODULES = [
    "bending",
    "gaussian_curvature",
    "tilt_in",
    "tilt_out",
    "tilt_smoothness_in",
    "tilt_smoothness_out",
    "bending_tilt_in",
    "bending_tilt_out",
    "tilt_disk_target_in",
    "tilt_disk_target_out",
    "tilt_rim_source_out",
    "tilt_rim_source_bilayer",
    "tilt_thetaB_contact_in",
    "curved_local_interface_law",
    "curved_local_interface_penalty",
]

VERTEX_MODULES = ["tilt", "tilt_smoothness", "bending_tilt"]


def cube_body_dict() -> dict:
    """Unit cube with a soft body-area target (body_area_penalty lane)."""
    from membrane_solver_tpu.meshgen import build

    data = build("cube")
    data.setdefault("global_parameters", {})["area_stiffness"] = 2.5
    # explicit-map body form carries arbitrary options (area_target)
    faces = data["bodies"]["faces"][0]
    data["bodies"] = {"0": {"faces": faces, "area_target": 5.5}}
    data.pop("instructions", None)
    return data


CUBE_BODY_MODULES = ["body_area_penalty"]

# --- Branch-variant lanes for the shared leaflet trio (VERDICT r3 item 5:
# per-leaflet parity fixtures "via lane states").  The trio's default-path
# math is pinned by the _in/_out delegates on the `kozlov` lane above;
# these two lanes pin the leaflet-specific BRANCHES of the shared
# implementations against the reference:
#
# `kozlov_scaffold` — the reference's physical-edge scaffold release
# fixture (tests/fixtures/...scaffold_gapfill_eps005_n3_release.yaml):
# leaflet_out_absent_presets=[disk] absence masks (mode=triangles),
# tilt_mass_mode_in=consistent, bending_tilt_assume_J0_presets_in=[disk],
# bending_tilt_base_term_reference_mode=flat_reference_zero_J0, and the
# inner-scaffold trace-row machinery — all active during module isolation.
#
# `kozlov_conn` — the R12 lane re-recorded under
# tilt_transport_model=connection_v1 (parallel-transported smoothness,
# reference tilt_smoothness.py:40-48,143-148) + tilt_mass_mode=consistent
# for both leaflets (reference tilt_params.py:15-24).
SCAFFOLD = os.path.join(
    REF,
    "tests",
    "fixtures",
    "kozlov_1disk_3d_free_disk_theory_parity_physical_edge_scaffold_gapfill_eps005_n3_release.yaml",
)
SCAFFOLD_GP = {
    # the fixture's own gp carries the branch switches; only the smoothness
    # moduli (absent there) need switching on for the smoothness modules
    "tilt_smoothness_modulus_in": 1.1,
    "tilt_smoothness_modulus_out": 1.2,
}
SCAFFOLD_MODULES = [
    "tilt_in",
    "tilt_out",
    "tilt_smoothness_in",
    "tilt_smoothness_out",
    "bending_tilt_in",
    "bending_tilt_out",
]

CONN_GP = dict(
    KOZLOV_GP,
    tilt_transport_model="connection_v1",
    tilt_mass_mode="consistent",
)
CONN_MODULES = ["tilt_in", "tilt_out", "tilt_smoothness_in", "tilt_smoothness_out"]

FLAT_GP = {
    "surface_tension": 0.55,
    "jordan_stiffness": 2.0,
    "jordan_target_area": 2.5,
    "edge_stiffness": 0.8,
    "line_tension": 0.45,
}
FLAT_MODULES = ["surface", "jordan_area", "edge_length_penalty", "expression", "line_tension"]


def flat_lane_dict() -> dict:
    from membrane_solver_tpu.meshgen import build

    data = build("flat_disk")
    gp = data.setdefault("global_parameters", {})
    gp.update(FLAT_GP)
    # tag boundary-ish edges for edge_length_penalty + line_tension, a few
    # vertices with expression energies
    edges = data.get("edges", [])
    for i, e in enumerate(edges):
        if i % 3 == 0:
            opts = e[-1] if isinstance(e[-1], dict) else None
            if opts is None:
                opts = {}
                e.append(opts)
            opts["energy"] = list(opts.get("energy", [])) + ["edge_length_penalty"]
            opts["target_length"] = 0.3
        if i % 4 == 0:
            opts = e[-1] if isinstance(e[-1], dict) else None
            if opts is None:
                opts = {}
                e.append(opts)
            opts["line_tension"] = True
    for i, v in enumerate(data.get("vertices", [])):
        if i % 5 == 0:
            opts = v[-1] if isinstance(v[-1], dict) else None
            if opts is None:
                opts = {}
                v.append(opts)
            opts["energy_expression"] = "0.3*(x*x + y*y) + 0.1*z"
    return data


def seeded(n, seed, scale=0.05):
    rng = np.random.default_rng(seed)
    return scale * rng.standard_normal((n, 3))


def record_lane(lane, mesh_src, gp_overrides, modules, *, leaflet, vertex_field):
    sys.path.insert(0, REF)
    from core.parameters.resolver import ParameterResolver
    from geometry.geom_io import load_data, parse_geometry
    from runtime.energy_context import EnergyContext

    def _fresh_ctx(m):
        ctx = EnergyContext()
        ctx.ensure_for_mesh(m)
        return ctx
    from runtime.energy_manager import EnergyModuleManager
    from runtime.evaluation_manager import EvaluationManager

    if isinstance(mesh_src, str):
        mesh = parse_geometry(load_data(mesh_src))
    else:
        mesh = parse_geometry(json.loads(json.dumps(mesh_src)))
    mesh.global_parameters.update(gp_overrides)
    if lane.startswith("kozlov"):
        tag_disk_targets(mesh)
        # perturb out of the flat state: at |K| = 0 every vertex sits on the
        # curvature-norm kink and gradients test sub-gradient choices, not
        # physics.  Same seeded jitter is applied by the parity test.
        rng = np.random.default_rng(31)
        for vid in mesh.vertex_ids:
            mesh.vertices[int(vid)].position[2] += 0.02 * rng.standard_normal()
        mesh.increment_version()
    mesh.build_position_cache()
    positions = mesh.positions_view()
    n = positions.shape[0]

    if leaflet:
        tin = seeded(n, 21)
        tout = seeded(n, 22)
        mesh.set_tilts_in_from_array(np.asarray(tin, order="F"))
        mesh.set_tilts_out_from_array(np.asarray(tout, order="F"))
        np.save(OUTDIR / f"refmod2_{lane}_tin.npy", tin)
        np.save(OUTDIR / f"refmod2_{lane}_tout.npy", tout)
    if vertex_field:
        tv = seeded(n, 23)
        mesh.set_tilts_from_array(np.asarray(tv, order="F"))
        np.save(OUTDIR / f"refmod2_{lane}_tilt.npy", tv)
    np.save(OUTDIR / f"refmod2_{lane}_vids.npy", np.asarray(mesh.vertex_ids, dtype=int))

    for name in modules:
        em = EnergyModuleManager([name])
        module = em.get_module(name)
        ev = EvaluationManager(
            mesh=mesh,
            global_params=mesh.global_parameters,
            param_resolver=ParameterResolver(mesh.global_parameters),
            energy_modules=[module],
            energy_module_names=[name],
            energy_context_fn=lambda: _fresh_ctx(mesh),
            experimental_energy_scale_fn=lambda _name: 1.0,
        )
        E, grad = ev.compute_energy_and_gradient_array(positions=positions)
        out = {"E": E, "grad": grad}
        mod = module
        if getattr(mod, "USES_TILT_LEAFLETS", False):
            gin = np.zeros_like(positions)
            gout = np.zeros_like(positions)
            E2 = ev.compute_energy_and_leaflet_tilt_gradients_array(
                positions=positions,
                tilts_in=mesh.tilts_in_view(),
                tilts_out=mesh.tilts_out_view(),
                tilt_in_grad_arr=gin,
                tilt_out_grad_arr=gout,
            )
            out.update(gin=gin, gout=gout, E_tilt=E2)
        elif getattr(mod, "USES_TILT", False):
            gt = np.zeros_like(positions)
            E2 = ev.compute_energy_and_tilt_gradient_array(
                positions=positions,
                tilts=mesh.tilts_view(),
                tilt_grad_arr=gt,
            )
            out.update(gtilt=gt, E_tilt=E2)
        np.savez_compressed(OUTDIR / f"refmod2_{lane}_{name}.npz", **out)
        print(f"{lane}/{name}: E={E:.10f}" + (f" E_tilt={out.get('E_tilt'):.10f}" if "E_tilt" in out else ""))


LANE_SPECS = {
    "kozlov": (KOZLOV, KOZLOV_GP, KOZLOV_MODULES, True, False),
    "kozlov_vertex": (KOZLOV, KOZLOV_GP, VERTEX_MODULES, False, True),
    "flat": (flat_lane_dict, {}, FLAT_MODULES, False, False),
    "cube_body": (cube_body_dict, {}, CUBE_BODY_MODULES, False, False),
    "kozlov_scaffold": (SCAFFOLD, SCAFFOLD_GP, SCAFFOLD_MODULES, True, False),
    "kozlov_conn": (KOZLOV, CONN_GP, CONN_MODULES, True, False),
}


def main(argv=None) -> None:
    if not os.path.isdir(REF):
        print("reference not mounted; skipping")
        return
    OUTDIR.mkdir(parents=True, exist_ok=True)
    names = (argv if argv is not None else sys.argv[1:]) or list(LANE_SPECS)
    for name in names:
        src, gp, modules, leaflet, vertex_field = LANE_SPECS[name]
        if callable(src):
            src = src()
        record_lane(name, src, gp, modules, leaflet=leaflet, vertex_field=vertex_field)
    print("done")


if __name__ == "__main__":
    main()

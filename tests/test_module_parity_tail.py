"""Tail module parity: contact mapping, leaflet presence, constraint rows.

Direct numeric checks vs the MOUNTED reference for the surfaces the
round-2 VERDICT listed as untested (item 7):

- ``contact_mapping``: the Kozlov/Barnoy (delta_eps, a, h) -> gamma line
  strength resolution incl. SI unit conversion, on a grid of
  configurations, vs reference modules/energy/contact_mapping.py.
- ``leaflet_presence``: the absent-vertex and present-triangle masks on
  the scaffold fixture (leaflet_out_absent_presets: [disk], mode
  triangles) vs reference modules/energy/leaflet_presence.py.
- constraint rows + enforcement for ``pin_to_plane`` (fixed/slide/fit
  modes), ``fix_facet_area`` and ``expression`` vs the reference's
  constraint_gradients_array / enforce_constraint.

Reference-side evaluations run in SUBPROCESSES: the reference's top-level
package names (modules, geometry, runtime, core, tools) collide with this
repo's own importables, so importing it in-process poisons later tests.

The shared leaflet implementations (tilt_leaflet, tilt_smoothness_leaflet,
bending_tilt_leaflet) have no standalone module API in the reference
(their array entry points require a ``leaflet`` kwarg); their full math is
pinned through the _in/_out delegate fixtures in
tests/test_module_parity_extended.py, recorded module-by-module.
mean_curvature_tilt is a dead legacy stub in the reference (it calls
Facet methods that do not exist); ours mirrors it as a stub.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


def _ref_eval(script: str, payload=None) -> dict:
    """Run a reference-side script in a clean subprocess; returns its JSON.

    The script sees ``PAYLOAD`` (parsed json) and must print one line
    ``RESULT <json>``.
    """
    prelude = (
        "import sys, json\n"
        f"sys.path.insert(0, {str(REF)!r})\n"
        f"PAYLOAD = json.loads({json.dumps(json.dumps(payload))})\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", prelude + script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(
        f"reference subprocess failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


CONTACT_CONFIGS = [
    {"tilt_rim_source_strength_in": 3.25},
    {"tilt_rim_source_contact_gamma_in": 1.5},
    {
        "tilt_rim_source_contact_h_in": 2.0,
        "tilt_rim_source_contact_delta_epsilon_over_a_in": 40.0,
    },
    {
        "tilt_rim_source_contact_h_in": 1.5,
        "tilt_rim_source_contact_delta_epsilon_in": 8.0,
        "tilt_rim_source_contact_a_in": 0.4,
    },
    {
        "tilt_rim_source_contact_units": "si",
        "tilt_rim_source_contact_h_in": 1.0e-9,
        "tilt_rim_source_contact_delta_epsilon_over_a_in": 4.0e10,
        "tilt_rim_source_contact_length_unit_m": 15.0e-9,
        "tilt_rim_source_contact_kappa_ref_J": 4.0e-20,
    },
    {
        "tilt_rim_source_contact_units": "solver",
        "tilt_rim_source_contact_h_in": 1.0,
        "tilt_rim_source_contact_delta_epsilon_over_a_in": 40.0,
    },
]

_CONTACT_SCRIPT = """
from modules.energy.contact_mapping import resolve_contact_line_strength


class R:
    def get(self, obj, name):
        return PAYLOAD.get(name)


cs = resolve_contact_line_strength(
    R(), None, strength_key="tilt_rim_source_strength_in", contact_suffix="_in"
)
print("RESULT " + json.dumps({"gamma": float(cs.gamma)}))
"""


@pytest.mark.parametrize("cfg", CONTACT_CONFIGS)
def test_contact_mapping_matches_reference(cfg):
    ref = _ref_eval(_CONTACT_SCRIPT, cfg)

    from membrane_solver_tpu.core.parameters import GlobalParameters
    from membrane_solver_tpu.energy.contact_mapping import (
        resolve_contact_line_strength as our_resolve,
    )

    ours = our_resolve(
        GlobalParameters(cfg), None, strength_key="tilt_rim_source_strength_in",
        contact_suffix="_in",
    )
    assert float(ours.gamma) == pytest.approx(float(ref["gamma"]), rel=1e-12), cfg


SCAFFOLD_FIXTURE = str(
    REF / "tests" / "fixtures"
    / "kozlov_1disk_3d_free_disk_theory_parity_physical_edge_scaffold_gapfill_eps005_n3_release.yaml"
)

_PRESENCE_SCRIPT = """
import numpy as np
from geometry.geom_io import load_data, parse_geometry
from modules.energy.leaflet_presence import (
    leaflet_absent_vertex_mask,
    leaflet_present_triangle_mask,
)

mesh = parse_geometry(load_data(PAYLOAD["fixture"]))
mesh.build_position_cache()
absent = leaflet_absent_vertex_mask(mesh, mesh.global_parameters, leaflet="out")
tri_rows, tri_fids = mesh.triangle_row_cache()
tri = leaflet_present_triangle_mask(
    mesh, np.asarray(tri_rows, dtype=int), absent_vertex_mask=absent
)
print("RESULT " + json.dumps({
    "vids": [int(v) for v in mesh.vertex_ids],
    "absent": [bool(b) for b in absent],
    "tri_fids": [int(f) for f in tri_fids],
    "tri_present": [bool(b) for b in tri],
}))
"""


def test_leaflet_presence_masks_match_reference():
    ref = _ref_eval(_PRESENCE_SCRIPT, {"fixture": SCAFFOLD_FIXTURE})

    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.energy.leaflet_presence import present_triangles

    mesh = parse_geometry(load_data(SCAFFOLD_FIXTURE))
    p = Minimizer(mesh, quiet=True).problem()

    ours_tri = np.asarray(present_triangles(p.topo, "out"))
    rows_by_fid = {int(fid): i for i, fid in enumerate(p.tri_facet_ids)}
    assert ours_tri is not None
    for fid, present in zip(ref["tri_fids"], ref["tri_present"]):
        assert bool(ours_tri[rows_by_fid[int(fid)]]) == bool(present), fid

    absent_key = "energy:leaflet_presence/absent_out"
    if absent_key in p.topo.extras:
        ours_absent = np.asarray(p.topo.extras[absent_key])
        row_of = {int(v): i for i, v in enumerate(p.vertex_ids)}
        for vid, absent in zip(ref["vids"], ref["absent"]):
            assert bool(ours_absent[row_of[int(vid)]]) == bool(absent), vid


def _constraint_lane(kind):
    """Small pinned lanes for the constraint families."""
    from membrane_solver_tpu.meshgen import build

    data = build("cube")
    data.pop("instructions", None)
    gp = data.setdefault("global_parameters", {})
    if kind.startswith("pin_to_plane"):
        mode = kind.split(":")[1]
        gp.update(
            {
                "pin_to_plane_normal": [0.0, 0.0, 1.0],
                "pin_to_plane_point": [0.0, 0.0, 0.0],
                "pin_to_plane_mode": mode,
            }
        )
        for i, v in enumerate(data["vertices"]):
            opts = v[-1] if isinstance(v[-1], dict) else None
            base_z = float(v[2])
            if base_z == 0.0:
                if opts is None:
                    opts = {}
                    v.append(opts)
                opts["constraints"] = ["pin_to_plane"]
    elif kind == "fix_facet_area":
        faces = data.get("faces") or data.get("facets")
        opts = faces[0][-1] if isinstance(faces[0][-1], dict) else None
        if opts is None:
            opts = {}
            faces[0].append(opts)
        opts["constraints"] = ["fix_facet_area"]
        opts["target_area"] = 0.8
    elif kind == "expression":
        # tag odd vertices only: the cube corner at the origin makes
        # grad(x^2+y^2+z^2) ~ 0 and the Newton projection ill-posed there
        for i, v in enumerate(data["vertices"]):
            if i % 2 == 1:
                opts = v[-1] if isinstance(v[-1], dict) else None
                if opts is None:
                    opts = {}
                    v.append(opts)
                opts["constraints"] = ["expression"]
                opts["constraint_expression"] = "x*x + y*y + z*z"
                opts["constraint_target"] = 0.9
    return data


_CONSTRAINT_SCRIPT = """
import importlib
import numpy as np
from geometry.geom_io import parse_geometry

data = PAYLOAD["data"]
cname = PAYLOAD["cname"]
rmod = importlib.import_module(f"modules.constraints.{cname}")
mesh = parse_geometry(data)
mesh.build_position_cache()
pos = mesh.positions_view()

rows = None
fn = getattr(rmod, "constraint_gradients_array", None)
if fn is not None:
    try:
        got = fn(mesh, mesh.global_parameters,
                 positions=pos, index_map=mesh.vertex_index_to_row)
    except TypeError:
        got = fn(mesh, mesh.global_parameters)
    if got:
        rows = [np.asarray(g).tolist() for g in got]

rmod.enforce_constraint(mesh, global_params=mesh.global_parameters)
vids = [int(v) for v in mesh.vertex_ids]
after = [np.asarray(mesh.vertices[v].position, dtype=float).tolist() for v in vids]
print("RESULT " + json.dumps({"vids": vids, "after": after, "rows": rows}))
"""


@pytest.mark.parametrize(
    "kind",
    ["pin_to_plane:fixed", "pin_to_plane:slide", "pin_to_plane:fit",
     "fix_facet_area", "expression"],
)
def test_constraint_rows_and_enforce_match_reference(kind):
    data = _constraint_lane(kind)
    cname = kind.split(":")[0]

    # seed a deterministic perturbation so the constraints are violated
    rng = np.random.default_rng(5)
    for v in data["vertices"]:
        for k in range(3):
            v[k] = float(v[k]) + 0.03 * rng.standard_normal()

    ref = _ref_eval(_CONSTRAINT_SCRIPT, {"data": data, "cname": cname})
    ref_vids = np.asarray(ref["vids"], dtype=int)
    ref_after = np.asarray(ref["after"], dtype=float)

    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.constraints import get_constraint
    from membrane_solver_tpu.device.state import build_params

    mesh = parse_geometry(json.loads(json.dumps(data)))
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    params = build_params(mesh)
    row_of = {int(v): i for i, v in enumerate(p.vertex_ids)}
    perm = np.array([row_of[int(v)] for v in ref_vids])

    mod = get_constraint(cname)
    maker = getattr(mod, "make_enforce", None)
    enforce = maker(p.spec) if maker is not None else getattr(mod, "enforce", None)
    assert enforce is not None, f"{cname} has no enforce surface"
    try:
        new_state = enforce(p.state, p.topo, params, context="mesh_operation")
    except TypeError:
        new_state = enforce(p.state, p.topo, params)
    ours_after = np.asarray(new_state.positions)[perm]
    tol = 1e-4 if cname == "expression" else 1e-9
    # expression: both sides run the same 5-iteration Newton to |c| < 1e-12,
    # but the reference differentiates by 1e-6 finite differences while ours
    # is analytic — converged positions agree to the FD error scale
    np.testing.assert_allclose(
        ours_after, ref_after, atol=tol,
        err_msg=f"{kind}: enforcement mismatch",
    )

    # dense row parity (order-free, sign-free set comparison)
    if ref["rows"]:
        rows_maker = getattr(mod, "make_constraint_gradient_rows", None)
        rows_fn = (
            rows_maker(p.spec)
            if rows_maker is not None
            else getattr(mod, "constraint_gradient_rows", None)
        )  # jit_core.make_gradient_projector discovery order
        assert rows_fn is not None, f"{cname} missing constraint rows"
        ours_rows = rows_fn(p.state, p.topo, params)
        assert ours_rows is not None
        ours_rows = np.asarray(ours_rows)[:, perm]
        ref_dense = [np.asarray(r) for r in ref["rows"]]
        live = [r for r in ours_rows if np.abs(r).max() > 0]
        assert len(live) == len(ref_dense), (
            f"{kind}: {len(live)} rows vs reference {len(ref_dense)}"
        )
        for r in ref_dense:
            best = min(
                min(float(np.abs(o - r).max()), float(np.abs(o + r).max()))
                for o in live
            )
            assert best < 1e-9, f"{kind}: unmatched reference row ({best})"

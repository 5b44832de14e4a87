"""End-to-end benchmark-lane parity vs unperturbed reference traces.

Goldens in fixtures/reference_lane_traces.json were recorded from the NumPy
reference with one process per command prefix (probing energies mid-run
perturbs the reference's trajectory through its cache layer — a hazard class
this rebuild eliminates by construction).

Tolerances: lanes whose trajectories contain no marginal Delaunay flips match
to machine precision; lanes where a flip decision sits on the 1e-3 margin
(cap, two_disks_sphere) diverge by small amounts afterwards.
"""

import json
from pathlib import Path

import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry
from membrane_solver_tpu.commands import CommandContext, execute_command_line

TRACES = Path(__file__).parent / "fixtures" / "reference_lane_traces.json"
REF_ROOT = Path("/root/reference")

# (lane, per-command rel tolerance, final rel tolerance)
LANES = [
    ("square_to_circle", 1e-10, 1e-10),
    ("catenoid", 1e-10, 1e-10),
    ("cap", 5e-2, 1e-2),
    ("two_disks_sphere", 5e-2, 2e-3),
]


def run_lane(rec):
    mesh = parse_geometry(load_data(REF_ROOT / rec["path"]))
    minim = Minimizer(mesh, quiet=True)
    step = mesh.global_parameters.get("step_size")
    if step is not None:
        minim.step_size = float(step)
    ctx = CommandContext(mesh=mesh, minimizer=minim, stepper=minim.stepper)
    energies = []
    for entry in rec["trace"]:
        execute_command_line(ctx, entry["cmd"])
        energies.append(ctx.minimizer.compute_energy())
    return ctx, energies


@pytest.mark.parametrize("lane,cmd_tol,final_tol", LANES)
def test_lane_parity(lane, cmd_tol, final_tol):
    if not REF_ROOT.exists():
        pytest.skip("reference meshes not mounted")
    traces = json.loads(TRACES.read_text())
    rec = traces[lane]
    ctx, energies = run_lane(rec)
    for entry, got in zip(rec["trace"], energies):
        assert got == pytest.approx(entry["energy"], rel=cmd_tol), entry["cmd"]
    assert energies[-1] == pytest.approx(rec["trace"][-1]["energy"], rel=final_tol)
    # entity counts must match exactly throughout
    final = rec["trace"][-1]
    assert len(ctx.minimizer.mesh.vertices) == final["n_vertices"]
    assert len(ctx.minimizer.mesh.facets) == final["n_facets"]

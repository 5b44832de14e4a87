"""End-to-end cube -> sphere evolution vs the recorded reference trace.

The trace in fixtures/cube_reference_trace.json was produced by running the
NumPy reference (`AvishaiBarnoy/membrane_solver`) through meshes/cube.json's
full instruction block (g50;r;u;V2;... g200).  Refinement preserves energy
exactly; minimization blocks must land on the reference energies.
"""

import json
from pathlib import Path

import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry
from membrane_solver_tpu.commands import CommandContext, execute_command_line

REF_CUBE = Path("/root/reference/meshes/cube.json")
TRACE = Path(__file__).parent / "fixtures" / "cube_reference_trace.json"


@pytest.fixture(scope="module")
def recipe_run():
    trace = json.loads(TRACE.read_text())
    mesh = parse_geometry(load_data(REF_CUBE))
    minim = Minimizer(mesh, quiet=True)
    ctx = CommandContext(mesh=mesh, minimizer=minim, stepper=minim.stepper)
    results = []
    for step in trace["trace"]:
        execute_command_line(ctx, step["cmd"])
        results.append(
            {
                "cmd": step["cmd"],
                "energy": ctx.minimizer.compute_energy(),
                "n_vertices": len(ctx.minimizer.mesh.vertices),
                "n_facets": len(ctx.minimizer.mesh.facets),
                "volume": ctx.minimizer.mesh.compute_total_volume(),
            }
        )
    return trace, results


def test_entity_counts_match_reference(recipe_run):
    trace, results = recipe_run
    for ref, got in zip(trace["trace"], results):
        assert got["n_vertices"] == ref["n_vertices"], got["cmd"]
        assert got["n_facets"] == ref["n_facets"], got["cmd"]


def test_first_g50_energy_parity(recipe_run):
    trace, results = recipe_run
    assert results[0]["cmd"] == "g50"
    assert results[0]["energy"] == pytest.approx(trace["trace"][0]["energy"], abs=1e-10)


def test_refine_preserves_energy(recipe_run):
    trace, results = recipe_run
    for i, step in enumerate(results):
        if step["cmd"] == "r" and i > 0:
            assert step["energy"] == pytest.approx(results[i - 1]["energy"], rel=1e-12)


def test_every_step_energy_parity(recipe_run):
    trace, results = recipe_run
    for ref, got in zip(trace["trace"], results):
        assert got["energy"] == pytest.approx(ref["energy"], abs=5e-12), got["cmd"]


def test_final_energy_parity(recipe_run):
    trace, results = recipe_run
    # full-recipe parity: the driver target is 1e-8; we hold ~1e-13
    assert results[-1]["energy"] == pytest.approx(trace["trace"][-1]["energy"], abs=1e-10)


def test_final_volume_close_to_target(recipe_run):
    _, results = recipe_run
    assert results[-1]["volume"] == pytest.approx(1.0, abs=5e-3)

"""Recipe capacity pre-planning (runtime/capacity_plan.py): refine counting
(macros, rN forms, compound lines) and exact growth prediction vs the real
refinement pipeline."""

from __future__ import annotations

from membrane_solver_tpu import load_data, parse_geometry
from membrane_solver_tpu.runtime.capacity_plan import (
    capacity_floors,
    count_refines,
    plan_for_instructions,
)


def test_count_refines_forms():
    assert count_refines(["g50", "r", "u", "V2", "g50", "r", "u", "g200"]) == 2
    assert count_refines(["r3"]) == 3
    assert count_refines(["r 2"]) == 2
    assert count_refines(["g5;r;u;r;g5"]) == 2
    assert count_refines(["g10"]) == 0
    assert count_refines([]) == 0


def test_count_refines_macros():
    macros = {"relax": ["g10", "r", "u"], "deep": ["relax", "r"]}
    assert count_refines(["relax"], macros) == 1
    assert count_refines(["deep"], macros) == 2
    # recursion guard: self-referencing macros terminate
    assert count_refines(["loop"], {"loop": ["loop", "r"]}) >= 1


def test_growth_prediction_matches_real_refinement():
    """The planner's floors must be >= and tight to the actual counts."""
    from membrane_solver_tpu.runtime.refinement import (
        refine_polygonal_facets,
        refine_triangle_mesh,
    )

    mesh = parse_geometry(load_data("meshes/cube.json"))
    for n in (1, 2):
        pred = capacity_floors(parse_geometry(load_data("meshes/cube.json")), n)
        m = parse_geometry(load_data("meshes/cube.json"))
        for _ in range(n):
            m = refine_triangle_mesh(refine_polygonal_facets(m))
        assert pred["nv"] >= len(m.vertices)
        assert pred["ne"] >= len(m.edges)
        assert pred["nf"] >= len(m.facets)
        # tight: within one power-of-two bucket of the real counts
        assert pred["nv"] <= 2 * max(len(m.vertices), 1)
        assert pred["ne"] <= 2 * max(len(m.edges), 1)
        assert pred["nf"] <= 2 * max(len(m.facets), 1)
    assert plan_for_instructions(mesh, ["g10"]) is None


def test_planned_recipe_matches_unplanned_energy():
    """Capacity floors must not change the math — same final energy as the
    step-by-step capacity growth (padding is masked out everywhere)."""
    from membrane_solver_tpu.commands import CommandContext, execute_command_line
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    recipe = ["g10", "r", "u", "g10"]
    energies = []
    for plan in (False, True):
        mesh = parse_geometry(load_data("meshes/cube.json"))
        mn = Minimizer(mesh, quiet=True)
        if plan:
            mn.capacity_floors = plan_for_instructions(mesh, recipe)
        ctx = CommandContext(mesh=mesh, minimizer=mn, stepper=mn.stepper)
        for line in recipe:
            execute_command_line(ctx, line)
            ctx.sync_mesh()
        energies.append(float(ctx.minimizer.compute_energy()))
    assert energies[0] == energies[1]

"""Command-layer behavior (reference commands/ registry/executor lanes)."""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, parse_geometry
from membrane_solver_tpu.commands.context import CommandContext
from membrane_solver_tpu.commands.executor import execute_command_line
from membrane_solver_tpu.commands.registry import get_command
from membrane_solver_tpu.meshgen import build


@pytest.fixture()
def ctx():
    mesh = parse_geometry(build("cube"))
    return CommandContext(mesh=mesh, minimizer=Minimizer(mesh, quiet=True))


def test_suffix_parsing():
    cmd, args = get_command("g5")
    assert cmd is not None and args == ["5"]
    cmd, args = get_command("r2")
    assert cmd is not None and args == ["2"]
    cmd, args = get_command("t1e-3")
    assert cmd is not None and args == ["1e-3"]
    cmd, args = get_command("V3")
    assert cmd is not None and args == ["3"]
    cmd, _ = get_command("no_such_cmd")
    assert cmd is None


def test_compound_line_and_energy_descent(ctx):
    e0 = float(ctx.minimizer.compute_energy())
    execute_command_line(ctx, "g5; g5")
    ctx.sync_mesh()
    assert float(ctx.minimizer.compute_energy()) < e0
    # vertex averaging on the coarse cube may raise surface energy slightly
    # (it smooths toward the sphere); it just has to execute and stay finite
    execute_command_line(ctx, "u")
    ctx.sync_mesh()
    assert np.isfinite(float(ctx.minimizer.compute_energy()))


def test_refine_grows_mesh(ctx):
    nf0 = len(ctx.mesh.facets)
    execute_command_line(ctx, "g3")
    execute_command_line(ctx, "r")
    ctx.sync_mesh()
    assert len(ctx.mesh.facets) > nf0


def test_set_command_updates_params(ctx):
    execute_command_line(ctx, "set surface_tension 2.5")
    assert float(ctx.mesh.global_parameters.get("surface_tension")) == 2.5


def test_macro_expansion(ctx):
    ctx.mesh.macros = {"gogo": "g2; g2"}
    e0 = float(ctx.minimizer.compute_energy())
    execute_command_line(ctx, "gogo")
    ctx.sync_mesh()
    assert float(ctx.minimizer.compute_energy()) < e0


def test_stepper_switch_and_hessian(ctx):
    execute_command_line(ctx, "g3")
    execute_command_line(ctx, "cg")
    execute_command_line(ctx, "g3")
    ctx.sync_mesh()
    assert ctx.minimizer.stepper.name in {"conjugate_gradient", "cg"}
    execute_command_line(ctx, "hessian")  # one-off BFGS step must not crash
    ctx.sync_mesh()
    assert np.isfinite(float(ctx.minimizer.compute_energy()))


def test_step_size_command(ctx):
    execute_command_line(ctx, "t1e-4")
    assert abs(ctx.minimizer.step_size - 1e-4) < 1e-18


def test_perturb_changes_positions(ctx):
    before = ctx.mesh.positions_array().copy()
    execute_command_line(ctx, "perturb 0.01")
    after = ctx.mesh.positions_array()
    assert np.abs(after - before).max() > 0.0


def test_set_vertex_attribute_and_print_filter(ctx, capsys):
    """`set vertex N fixed true` + `print edges len > X` (reference
    commands/meta.py:8-640)."""
    execute_command_line(ctx, "set vertex 0 fixed true")
    ctx.sync_mesh()
    assert bool(ctx.mesh.vertices[0].fixed)
    execute_command_line(ctx, "print edges len > 0.5")
    out = capsys.readouterr().out
    assert out.strip()  # listing printed


def test_energy_breakdown_and_tilt_stats_commands(ctx, capsys):
    execute_command_line(ctx, "energy")
    out = capsys.readouterr().out
    assert "surface" in out.lower() or "total" in out.lower()
    execute_command_line(ctx, "tilt_stats")  # no tilt modules: quiet no-op

    kmesh = parse_geometry(build("kozlov_1disk"))
    kmesh.vertices[1].tilt_in[:] = [0.1, 0.0, 0.0]  # non-zero field to report
    kctx = CommandContext(mesh=kmesh, minimizer=Minimizer(kmesh, quiet=True))
    execute_command_line(kctx, "tilt_stats")
    out = capsys.readouterr().out
    assert "tilt_in" in out


def test_energy_command_modes(ctx, capsys):
    """energy total/ref/stats/usage (reference commands/meta.py:84-187)."""
    execute_command_line(ctx, "energy total")
    out = capsys.readouterr().out
    assert "Current Total Energy:" in out

    execute_command_line(ctx, "energy ref")
    out = capsys.readouterr().out
    assert "Energy reference set:" in out
    assert ctx.minimizer.energy_ref_total is not None
    assert (
        abs(ctx.minimizer.energy_ref_total - float(ctx.minimizer.compute_energy()))
        < 1e-9
    )

    execute_command_line(ctx, "energy stats")
    out = capsys.readouterr().out
    assert "Curvature diagnostics" in out
    assert "p90" in out

    execute_command_line(ctx, "energy bogus_mode")
    out = capsys.readouterr().out
    assert "Usage: energy" in out


def test_energy_breakdown_external_split(capsys):
    """Lanes with IS_EXTERNAL_WORK modules report the internal/external
    split and deltas vs the stored reference (reference meta.py:111-143)."""
    kmesh = parse_geometry(build("kozlov_1disk"))
    kctx = CommandContext(mesh=kmesh, minimizer=Minimizer(kmesh, quiet=True))
    execute_command_line(kctx, "energy ref")
    capsys.readouterr()
    execute_command_line(kctx, "energy")
    out = capsys.readouterr().out
    if any(
        "rim_source" in n or "contact" in n
        for n in kctx.minimizer.energy_module_names
    ):
        assert "internal (no sources):" in out
        assert "vs ref:" in out


def test_macro_recursion_guard(ctx):
    ctx.mesh.macros["loop_a"] = "loop_b"
    ctx.mesh.macros["loop_b"] = "loop_a"
    # must terminate (depth guard), not recurse forever
    execute_command_line(ctx, "loop_a")


def test_history_and_refresh_commands(ctx, capsys):
    execute_command_line(ctx, "g1")
    execute_command_line(ctx, "history")  # prints via readline/log; no raise
    execute_command_line(ctx, "refresh")  # cache refresh no-op must not raise


def test_unknown_command_warns_and_continues(ctx, caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        execute_command_line(ctx, "definitely_not_a_command_42")
    # still usable afterwards
    execute_command_line(ctx, "g1")

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

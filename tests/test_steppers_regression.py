"""Stepper regressions pinned to reference-recorded values."""

from pathlib import Path

import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry
from membrane_solver_tpu.commands import CommandContext, execute_command_line

REF = Path("/root/reference/benchmarks/inputs/bench_catenoid.json")


def run(cmds):
    mesh = parse_geometry(load_data(REF))
    minim = Minimizer(mesh, quiet=True)
    ctx = CommandContext(mesh=mesh, minimizer=minim, stepper=minim.stepper)
    for cmd in cmds:
        execute_command_line(ctx, cmd)
    return ctx.minimizer


@pytest.mark.skipif(not REF.exists(), reason="reference meshes not mounted")
def test_bfgs_catenoid_matches_reference():
    # golden from reference: r2; bfgs; g12 -> E, step_size
    minim = run(["r2", "bfgs", "g12"])
    assert minim.compute_energy() == pytest.approx(35.33005841214822, abs=1e-10)
    assert minim.step_size == pytest.approx(0.129746337890625, abs=1e-15)


@pytest.mark.skipif(not REF.exists(), reason="reference meshes not mounted")
def test_cg_catenoid_matches_reference():
    # golden derived from the catenoid lane (exact through cg; see lane test)
    minim = run(["r2", "V", "g20", "V", "g20", "V", "cg", "g20"])
    assert minim.compute_energy() == pytest.approx(34.72619326335611, abs=1e-8)

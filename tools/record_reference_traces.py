#!/usr/bin/env python3
"""Record unperturbed reference energy traces for benchmark lanes.

For each lane and each command-prefix length k, a FRESH subprocess runs the
mounted reference through commands[0..k] and reports the energy once at the
end — probing energies mid-run perturbs the reference's trajectory through
its version-counter cache layer, so every trace point gets its own process
(the hazard class this rebuild eliminates by construction; see
tests/test_lanes_e2e.py).

Usage:  python tools/record_reference_traces.py dented_cube bending
Merges results into tests/fixtures/reference_lane_traces.json.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
FIXTURE = REPO / "tests" / "fixtures" / "reference_lane_traces.json"

# lane -> (input path relative to the reference root, command list, overrides)
LANES = {
    "square_to_circle": ("benchmarks/inputs/bench_square_to_circle.json", None, {}),
    "catenoid": ("benchmarks/inputs/bench_catenoid.json", None, {}),
    "cap": ("benchmarks/inputs/bench_cap.json", None, {}),
    "two_disks_sphere": ("benchmarks/inputs/bench_two_disks_sphere.json", None, {}),
    "dented_cube": ("benchmarks/inputs/bench_dented_cube.json", None, {}),
    "bending": (
        "benchmarks/inputs/bench_bending_analytic.json",
        ["g5", "g5", "g5", "g5"],
        {"energy_modules": ["bending"], "constraint_modules": ["volume"]},
    ),
}

_PROBE = r"""
import io, json, sys
from contextlib import redirect_stdout, redirect_stderr
sys.path.insert(0, {ref_root!r})
from geometry.geom_io import load_data, parse_geometry
from runtime.minimizer import Minimizer
from runtime.energy_manager import EnergyModuleManager
from runtime.constraint_manager import ConstraintModuleManager
from runtime.steppers.gradient_descent import GradientDescent
from commands.executor import execute_command_line
from commands.context import CommandContext

# Clean-evaluation mode: flush the curvature cache at the start of every
# iteration — the same flush the reference itself performs before any
# user-visible energy report (minimizer.py final block and per-step print
# path: "Clear curvature cache ... to avoid leaking stale tilt-dependent
# intermediates across iterations").  Without it, the reference's
# within-call trajectory depends on stale curvature intermediates and even
# disagrees with its own per-single-step execution of the same protocol
# (g5 != g1;g1;g1;g1;g1) — recorded in tests/fixtures/ref_kkt_pathology.json.
if {clean!r}:
    _orig_minimize = Minimizer.minimize
    def _clean_minimize(self, n_steps=1, callback=None):
        def cb(mesh, i):
            mesh._curvature_cache = {{}}
            mesh._curvature_version = -1
            if callback:
                callback(mesh, i)
        return _orig_minimize(self, n_steps, cb)
    Minimizer.minimize = _clean_minimize

mesh = parse_geometry(load_data({path!r}))
overrides = {overrides!r}
em = EnergyModuleManager(overrides.get("energy_modules") or mesh.energy_modules)
cm = ConstraintModuleManager(overrides.get("constraint_modules") or mesh.constraint_modules)
mn = Minimizer(mesh, mesh.global_parameters, GradientDescent(), em, cm, quiet=True)
step = mesh.global_parameters.get("step_size")
if step is not None:
    mn.step_size = float(step)
ctx = CommandContext(mesh=mesh, minimizer=mn, stepper=mn.stepper)
cmds = {cmds!r}
with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
    for cmd in cmds:
        execute_command_line(ctx, cmd)
    E = float(ctx.minimizer.compute_energy())
out = {{
    "cmd": cmds[-1],
    "energy": E,
    "n_vertices": len(ctx.minimizer.mesh.vertices),
    "n_facets": len(ctx.minimizer.mesh.facets),
    "area": float(ctx.minimizer.mesh.compute_total_surface_area()),
}}
print("TRACE " + json.dumps(out))
"""


def record(lane: str, clean: bool = True) -> dict:
    rel, cmds, overrides = LANES[lane]
    path = str(REF / rel)
    if cmds is None:
        data = json.loads(Path(path).read_text())
        cmds = [c.strip() for line in data.get("instructions", [])
                for c in str(line).split(";") if c.strip()]
    trace = []
    for k in range(1, len(cmds) + 1):
        code = _PROBE.format(ref_root=str(REF), path=path, cmds=cmds[:k], overrides=overrides, clean=clean)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in out.stdout.splitlines() if ln.startswith("TRACE ")), None)
        if line is None:
            raise RuntimeError(f"{lane}[{k}] failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
        entry = json.loads(line[len("TRACE "):])
        trace.append(entry)
        print(f"{lane}: {entry['cmd']:>8s} E={entry['energy']:.12f} nv={entry['n_vertices']}")
    return {"path": rel, "commands": cmds, "overrides": overrides, "trace": trace}


def main() -> None:
    lanes = sys.argv[1:] or list(LANES)
    traces = json.loads(FIXTURE.read_text()) if FIXTURE.exists() else {}
    for lane in lanes:
        traces[lane] = record(lane)
    FIXTURE.write_text(json.dumps(traces, indent=1))
    print("wrote", FIXTURE)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Reproduce the reference's stale-cache descent on the full kozlov recipe.

VERDICT round-1 item 4: the kozlov lane claim ("the reference descends past
E=39.49 only via a stale-cache artifact; ~0.019 restored-state energy
mismatch after a rejected line search; full-recipe final energies 126.50 ref
vs 718.34 ours") must be demonstrated, not asserted.  This script runs the
MOUNTED reference (read-only, in-process NumPy) through its own
``profile_relax`` recipe (g40; r; V5; g100; r; V5; g120 — the macro shipped
in benchmarks/inputs/bench_kozlov_1disk_profile_hard_rim_R12.yaml) and
records:

1. **Restored-state energy mismatch.**  After every outer step we compare
   the reference's in-place energy against a fresh re-parse of the SAME
   serialized state (geometry/geom_io round-trip).  The reference's
   rejected-line-search restore path (runtime/steppers/line_search.py:
   394-414) writes positions/tilts back without refreshing every cached
   view, so the in-place evaluator and a fresh evaluator disagree on
   bit-identical geometry; the gap feeds its subsequent descent.

2. **Both full-recipe traces.**  Stage-by-stage energies for the reference
   (in-place AND fresh-reparse) and for this solver on the identical
   recipe, so the divergence is pinned to recorded numbers rather than a
   docstring.

Writes ``tests/fixtures/ref_stale_cache_traces.json``.  Runs on CPU only;
skips gracefully when /root/reference is absent.  Expect ~1h wall-clock
(the reference's refined stages run minutes per step).
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import time
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = os.environ.get("MEMBRANE_REFERENCE_ROOT", "/root/reference")
OUT = REPO / "tests" / "fixtures" / "ref_stale_cache_traces.json"
LANE = "benchmarks/inputs/bench_kozlov_1disk_profile_hard_rim_R12.yaml"

# the profile_relax macro from the lane file, expanded (print/tstat/energy
# diagnostics dropped — they don't change state)
RECIPE = ("g40", "r", "V5", "g100", "r", "V5", "g120")


def run_reference(probe_every: int = 10) -> dict:
    sys.path.insert(0, REF)
    from commands.context import CommandContext
    from commands.executor import execute_command_line
    from geometry.geom_io import load_data, parse_geometry, save_geometry
    from runtime.constraint_manager import ConstraintModuleManager
    from runtime.energy_manager import EnergyModuleManager
    from runtime.minimizer import Minimizer
    from runtime.steppers.gradient_descent import GradientDescent

    def build(mesh):
        return Minimizer(
            mesh,
            mesh.global_parameters,
            GradientDescent(),
            EnergyModuleManager(mesh.energy_modules),
            ConstraintModuleManager(mesh.constraint_modules),
            quiet=True,
        )

    mesh = parse_geometry(load_data(os.path.join(REF, LANE)))
    minim = build(mesh)
    ctx = CommandContext(mesh, minim, minim.stepper)

    def fresh_energy() -> float:
        tmp = "/tmp/_ref_stale_probe.json"
        save_geometry(ctx.minimizer.mesh, tmp)
        m2 = parse_geometry(load_data(tmp))
        return float(build(m2).compute_energy())

    stages = []
    worst = {"stage": None, "step": None, "mismatch": 0.0}
    t0 = time.time()
    for stage_idx, cmd in enumerate(RECIPE):
        if cmd.startswith("g"):
            # step the g-block manually so the in-place-vs-fresh probe can
            # run inside the stage (every probe_every steps + the last)
            n = int(cmd[1:])
            probes = []
            with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
                for step in range(n):
                    ctx.minimizer.minimize(n_steps=1)
                    if step % probe_every == probe_every - 1 or step == n - 1:
                        e_inplace = float(ctx.minimizer.compute_energy())
                        e_fresh = fresh_energy()
                        mism = abs(e_inplace - e_fresh)
                        probes.append(
                            {
                                "step": step,
                                "e_inplace": e_inplace,
                                "e_fresh": e_fresh,
                                "mismatch": mism,
                            }
                        )
                        if mism > worst["mismatch"]:
                            worst = {
                                "stage": cmd,
                                "step": step,
                                "mismatch": mism,
                                "e_inplace": e_inplace,
                                "e_fresh": e_fresh,
                            }
            stages.append(
                {
                    "cmd": cmd,
                    "probes": probes,
                    "elapsed_s": round(time.time() - t0, 1),
                }
            )
        else:
            with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
                execute_command_line(ctx, cmd)
            stages.append({"cmd": cmd, "elapsed_s": round(time.time() - t0, 1)})
        print(
            f"[ref] {cmd} done t={time.time() - t0:.0f}s "
            f"E={float(ctx.minimizer.compute_energy()):.6f}",
            file=sys.stderr,
            flush=True,
        )

    final_inplace = float(ctx.minimizer.compute_energy())
    final_fresh = fresh_energy()
    return {
        "recipe": list(RECIPE),
        "stages": stages,
        "worst_restored_state_mismatch": worst,
        "final_energy_inplace": final_inplace,
        "final_energy_fresh": final_fresh,
        "final_mismatch": abs(final_inplace - final_fresh),
    }


def run_ours() -> dict:
    """Run this solver on the identical recipe in a subprocess (CPU f64)."""
    code = f"""
import json, sys, io
from contextlib import redirect_stdout, redirect_stderr
sys.path.insert(0, {str(REPO)!r})
import jax
jax.config.update("jax_platforms", "cpu")
from membrane_solver_tpu import Minimizer, load_data, parse_geometry
from membrane_solver_tpu.commands.context import CommandContext
from membrane_solver_tpu.commands.executor import execute_command_line
mesh = parse_geometry(load_data({os.path.join(REF, LANE)!r}))
mn = Minimizer(mesh, quiet=True)
ctx = CommandContext(mesh=mesh, minimizer=mn, stepper=mn.stepper)
trace = []
for cmd in {list(RECIPE)!r}:
    with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
        execute_command_line(ctx, cmd)
        ctx.sync_mesh()
    trace.append({{"cmd": cmd, "energy": float(ctx.minimizer.compute_energy())}})
print("OURS_RESULT " + json.dumps({{"stages": trace, "final_energy": trace[-1]["energy"]}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("OURS_RESULT "):
            return json.loads(line[len("OURS_RESULT "):])
    raise RuntimeError(f"our-solver run failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    if not os.path.isdir(REF):
        print(json.dumps({"skipped": f"reference not found at {REF}"}))
        return
    report = {
        "lane": LANE,
        "note": (
            "reference profile_relax recipe; in-place vs fresh-reparse "
            "energies expose the restored-state cache pollution that drives "
            "the reference's descent past the clean stall"
        ),
    }
    print("[ours] running identical recipe...", file=sys.stderr, flush=True)
    report["ours"] = run_ours()
    print("[ref] running reference recipe...", file=sys.stderr, flush=True)
    report["reference"] = run_reference()
    OUT.write_text(json.dumps(report, indent=2))
    print(json.dumps({
        "reference_final_inplace": report["reference"]["final_energy_inplace"],
        "reference_final_fresh": report["reference"]["final_energy_fresh"],
        "ours_final": report["ours"]["final_energy"],
        "worst_mismatch": report["reference"]["worst_restored_state_mismatch"],
        "out": str(OUT),
    }, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Performance suite over the named benchmark scenarios.

TPU-native analog of the reference's ``tools/suite.py`` (reference
tools/suite.py:29-160): runs each named scenario end-to-end (load ->
instruction recipe -> final energy), times the wall-clock, compares
against the best-known history in ``benchmarks/results.json``, and
updates the history when a run improves it.

    python tools/suite.py                 # all scenarios
    python tools/suite.py cube catenoid   # a subset
    python tools/suite.py --profile       # + per-scenario .pstats dumps
    python tools/suite.py --platform cpu  # pin the jax backend
    python tools/suite.py --check         # exit 1 if any case regresses >1.5x

Scenario inputs come from committed meshes (``meshes/``,
``benchmarks/inputs/``) or are generated on the fly by
``membrane_solver_tpu.meshgen`` — no external files required.
"""

from __future__ import annotations

import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # before jaxlib loads

import argparse
import cProfile
import io
import json
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

RESULTS = REPO / "benchmarks" / "results.json"
PROFILE_DIR = REPO / "benchmarks" / "outputs" / "profiles"

# name -> (input source, instruction override or None)
# source "gen:<builder>" uses meshgen; otherwise a repo-relative path whose
# embedded instructions run as-is.
SCENARIOS = {
    "cube": ("meshes/cube.json", None),
    "cube770": ("benchmarks/inputs/cube_770.json", ["g200"]),
    "square_to_circle": ("gen:square_sheet", None),
    "catenoid": ("gen:catenoid", None),
    "spherical_cap": ("gen:spherical_cap", None),
    "dented_cube": ("gen:dented_cube", None),
    "two_disks_sphere": ("gen:two_disks_sphere", None),
    "torus_gauss_bonnet": ("gen:torus", None),
    "tilt_decay": ("gen:rect_tilt_source", None),
    "kozlov_1disk": ("gen:kozlov_1disk", ["g10", "u", "g10"]),
}


def load_scenario(name: str):
    from membrane_solver_tpu import load_data, parse_geometry
    from membrane_solver_tpu.meshgen import build

    source, override = SCENARIOS[name]
    if source.startswith("gen:"):
        data = build(source[4:])
    else:
        data = load_data(str(REPO / source))
    mesh = parse_geometry(data)
    instructions = override if override is not None else list(mesh.instructions or [])
    return mesh, instructions


def run_scenario(name: str, quiet: bool = True):
    """Returns (elapsed_seconds, final_energy)."""
    from membrane_solver_tpu.commands.context import CommandContext
    from membrane_solver_tpu.commands.executor import execute_command_line
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    mesh, instructions = load_scenario(name)
    minim = Minimizer(mesh, quiet=quiet)
    ctx = CommandContext(mesh=mesh, minimizer=minim)
    t0 = time.perf_counter()
    for line in instructions:
        execute_command_line(ctx, str(line))
        ctx.sync_mesh()
    elapsed = time.perf_counter() - t0
    return elapsed, float(ctx.minimizer.compute_energy())


def load_history() -> dict:
    if RESULTS.exists():
        return json.loads(RESULTS.read_text())
    return {}


def save_history(history: dict) -> None:
    RESULTS.parent.mkdir(parents=True, exist_ok=True)
    RESULTS.write_text(json.dumps(history, indent=1) + "\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--platform", default=None, help="jax platform (cpu/tpu)")
    ap.add_argument("--check", action="store_true",
                    help="regression gate: fail on >--threshold x slowdown")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--no-update", action="store_true",
                    help="don't write improved times back to the history")
    ap.add_argument("--runs", type=int, default=2,
                    help="runs per scenario; the best time is recorded "
                    "(run 1 pays jit tracing, later runs measure the "
                    "steady-state the solver was designed for)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    names = args.names or list(SCENARIOS)
    unknown = [n for n in names if n not in SCENARIOS]
    if unknown:
        print(f"unknown scenarios: {unknown}; known: {sorted(SCENARIOS)}")
        return 2

    history = load_history()
    regressions = []
    for name in names:
        if args.profile:
            PROFILE_DIR.mkdir(parents=True, exist_ok=True)
            prof = cProfile.Profile()
            prof.enable()
        elapsed, energy = run_scenario(name)
        for _ in range(max(args.runs - 1, 0)):
            e2, energy2 = run_scenario(name)
            if abs(energy2 - energy) > 1e-9 * max(abs(energy), 1.0):
                print(f"WARNING: {name} warm-run energy drifted "
                      f"{energy!r} -> {energy2!r}")
            elapsed = min(elapsed, e2)
        if args.profile:
            prof.disable()
            pstats_path = PROFILE_DIR / f"{name}.pstats"
            prof.dump_stats(str(pstats_path))
            buf = io.StringIO()
            pstats.Stats(prof, stream=buf).sort_stats("cumulative").print_stats(30)
            (PROFILE_DIR / f"{name}.txt").write_text(buf.getvalue())

        best = history.get(name, {}).get("best_seconds")
        status = ""
        if best is not None:
            ratio = elapsed / best
            status = f"  ({ratio:5.2f}x best {best:.3f}s)"
            if args.check and ratio > args.threshold:
                regressions.append((name, ratio))
        if (best is None or elapsed < best) and not args.no_update:
            history[name] = {
                "best_seconds": round(elapsed, 4),
                "energy": energy,
                "platform": jax.default_backend(),
                "recorded": time.strftime("%Y-%m-%d"),
            }
        print(f"{name:22s} {elapsed:8.3f}s  E={energy:.10g}{status}")

    if not args.no_update:
        save_history(history)
    if regressions:
        print("REGRESSIONS:", ", ".join(f"{n} {r:.2f}x" for n, r in regressions))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

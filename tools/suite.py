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

# scenarios ported from the reference's benchmarks/ directory that drive the
# solver through its library surface instead of an instruction recipe
# (reference benchmark_kozlov_1disk_3d_tensionless.py et al.); lanes that
# read the mounted reference's input meshes skip cleanly when absent
REF_ROOT = Path("/root/reference")


def _minimize_lane(path, gp_updates, n_steps, step_size=None):
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    mesh = parse_geometry(load_data(str(path)))
    mesh.global_parameters.update(gp_updates)
    mn = Minimizer(mesh, quiet=True)
    if step_size is not None:
        mn.step_size = float(step_size)
    t0 = time.perf_counter()
    mn.minimize(n_steps)
    return time.perf_counter() - t0, float(mn.compute_energy())


def run_kozlov_tensionless():
    """reference benchmarks/benchmark_kozlov_1disk_3d_tensionless.py:38-70"""
    return _minimize_lane(
        REF_ROOT / "benchmarks/inputs/bench_kozlov_1disk_tensionless_single_leaflet_source.yaml",
        {
            "bending_modulus_in": 1.0,
            "bending_modulus_out": 1.0,
            "tilt_modulus_in": 135.0,
            "tilt_modulus_out": 135.0,
            "tilt_rim_source_strength_in": 5000.0,
            "tilt_solve_mode": "coupled",
            "tilt_step_size": 0.05,
            "tilt_inner_steps": 60,
            "tilt_tol": 1e-12,
            "step_size": 0.003,
            "step_size_mode": "fixed",
        },
        120,
        step_size=0.003,
    )


def run_induction_quick():
    """reference benchmarks/benchmark_kozlov_1disk_3d_induction_quick.py:34-60"""
    return _minimize_lane(
        REF_ROOT / "benchmarks/inputs/bench_kozlov_1disk_induction_quick.yaml",
        {
            "surface_tension": 0.0,
            "tilt_rim_source_contact_units": "solver",
            "tilt_rim_source_contact_h_in": 1.0,
            "tilt_rim_source_contact_delta_epsilon_over_a_in": 40.0,
            "tilt_solve_mode": "nested",
            "tilt_step_size": 0.15,
            "tilt_inner_steps": 40,
            "tilt_tol": 1e-10,
            "step_size": 0.006,
            "step_size_mode": "fixed",
        },
        30,
        step_size=0.006,
    )


def run_tilt_relaxation():
    """One nested inner tilt relaxation pass on the Milestone C mesh
    (reference benchmarks/benchmark_tilt_relaxation.py:40-62)."""
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    mesh = parse_geometry(
        load_data(str(REF_ROOT / "meshes/caveolin/kozlov_annulus_milestone_c_soft_source.yaml"))
    )
    mesh.global_parameters.update(
        {"tilt_solve_mode": "nested", "tilt_inner_steps": 50,
         "tilt_step_size": 0.05, "tilt_tol": 0.0}
    )
    mn = Minimizer(mesh, quiet=True)
    mn.enforce_constraints_after_mesh_ops()
    t0 = time.perf_counter()
    mn.relax_leaflet_tilts(max_iters=50, step_size=0.05, tol=0.0)
    return time.perf_counter() - t0, float(mn.compute_energy())


def run_annulus_decay_length():
    """Refine x2, relax 400 nested iterations, fit |t(r)| ~ A exp(-(r-r0)/lam)
    (reference benchmarks/benchmark_kozlov_annulus_decay_length.py:50-160)."""
    import numpy as np

    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.runtime.refinement import refine_triangle_mesh

    mesh = parse_geometry(
        load_data(str(REF_ROOT / "meshes/caveolin/kozlov_annulus_flat_hard_source.yaml"))
    )
    for _ in range(2):
        mesh = refine_triangle_mesh(mesh)
    mn = Minimizer(mesh, quiet=True)
    t0 = time.perf_counter()
    mn.relax_leaflet_tilts(max_iters=400, step_size=0.05, tol=0.0)
    p = mn.problem()
    positions = np.asarray(p.state.positions)[: p.n_vertices]
    mags = np.linalg.norm(np.asarray(p.state.tilts_in)[: p.n_vertices], axis=1)
    radii = np.linalg.norm(positions[:, :2], axis=1)
    # radial binning + log-linear fit over the interior range (1.2, 2.7)
    bins = np.linspace(radii.min(), radii.max(), 25)
    idx = np.clip(np.digitize(radii, bins) - 1, 0, 23)
    m_centers = np.array([mags[idx == b].mean() if (idx == b).any() else 0.0 for b in range(24)])
    r_centers = 0.5 * (bins[:-1] + bins[1:])
    mask = (r_centers >= 1.2) & (r_centers <= 2.7) & (m_centers > 1e-12)
    lam = float("nan")
    if mask.sum() >= 3:
        slope, _ = np.polyfit(r_centers[mask], np.log(m_centers[mask]), 1)
        if slope < 0:
            lam = -1.0 / slope
    elapsed = time.perf_counter() - t0
    return elapsed, lam


def run_volume_optimization():
    """100 volume-penalty energy+gradient assemblies on a 6k-vertex sphere
    (reference benchmarks/benchmark_volume_optimization.py:98-130)."""
    from membrane_solver_tpu import Minimizer, parse_geometry
    from membrane_solver_tpu.meshgen import build

    data = build("sphere")
    data.setdefault("global_parameters", {})
    data["global_parameters"]["volume_constraint_mode"] = "penalty"
    data["global_parameters"]["volume_stiffness"] = 10.0
    data.pop("instructions", None)
    mesh = parse_geometry(data)
    from membrane_solver_tpu.runtime.refinement import refine_triangle_mesh

    import numpy as np

    for _ in range(5):  # 8 -> 8192 triangles (reference subdivisions=5)
        mesh = refine_triangle_mesh(mesh)
        for v in mesh.vertices.values():  # project back to the sphere
            n = np.linalg.norm(np.asarray(v.position, dtype=float))
            if n > 1e-12:
                v.position[:] = np.asarray(v.position) / n
    mn = Minimizer(mesh, quiet=True, energy_modules=["surface", "volume"])
    E, _g = mn.compute_energy_and_gradient_array()  # compile
    t0 = time.perf_counter()
    for _ in range(100):
        E, _g = mn.compute_energy_and_gradient_array()
    return time.perf_counter() - t0, float(E)


def run_bending_analytic():
    """20 analytic-gradient Helfrich bending + Lagrange-volume GD steps on
    the 386-vertex sphere (reference benchmarks/benchmark_bending.py:21-38,
    suite lane 'bending_analytic' at reference tools/suite.py:35)."""
    return _minimize_lane(
        REF_ROOT / "benchmarks/inputs/bench_bending_analytic.json", {}, 20
    )


def run_flat_disk_tilt_mass_mode():
    """Lumped vs consistent tilt-mass discretization through the flat-disk
    KH reproducer, on the reference benchmark's own protocol
    (benchmarks/benchmark_flat_disk_tilt_mass_mode.py:84-90 defaults:
    refine_level=1, theta_mode='optimize', optimize_preset='kh_wide',
    parameterization='kh_physical', smoothness_model='splay_twist').
    Times both modes end-to-end; the returned energy is the
    consistent-mode total (the mode the reference's report keys on)."""
    sys.path.insert(0, str(REPO / "tools"))
    from reproduce_flat_disk_one_leaflet import run_benchmark

    t0 = time.perf_counter()
    energies = {}
    for mode in ("lumped", "consistent"):
        report = run_benchmark(
            refine_level=1,
            tilt_mass_mode_in=mode,
            theta_mode="optimize",
            optimize_preset="kh_wide",
            parameterization="kh_physical",
            smoothness_model="splay_twist",
        )
        energies[mode] = float(report["metrics"]["mesh"]["total_energy"])
    return time.perf_counter() - t0, energies["consistent"]


def run_free_disk_light():
    """profile_relax_light macro on the free-disk hard-rim mesh — covers
    BOTH reference benchmarks that run this macro on this exact mesh:
    benchmarks/benchmark_kozlov_1disk_3d_profile_hard_rim_free_disk_light.py
    (MACRO at :30) and benchmarks/benchmark_profile_relax_light.py:34-36
    (same yaml default, same execute_command_line protocol)."""
    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.commands.context import CommandContext
    from membrane_solver_tpu.commands.executor import execute_command_line

    mesh = parse_geometry(load_data(str(
        REF_ROOT
        / "meshes/caveolin/kozlov_1disk_3d_tensionless_single_leaflet_profile_hard_rim_R12_free_disk.yaml"
    )))
    mn = Minimizer(mesh, quiet=True)
    ctx = CommandContext(mesh=mesh, minimizer=mn)
    t0 = time.perf_counter()
    execute_command_line(ctx, "profile_relax_light")
    ctx.sync_mesh()
    return time.perf_counter() - t0, float(ctx.minimizer.compute_energy())


def _hard_rim_protocol(mesh_file):
    """The reference's flagship relaxation protocol: 40+100+120 coupled-
    tilt GD steps with two refine+5x-vertex-average interludes
    (benchmark_kozlov_1disk_3d_profile_hard_rim[_free_disk].py:43-77;
    74.9 s / 299 s on this host 2026-08-18)."""
    import numpy as np

    from membrane_solver_tpu import Minimizer, load_data, parse_geometry
    from membrane_solver_tpu.runtime.refinement import (
        refine_polygonal_facets,
        refine_triangle_mesh,
    )
    from membrane_solver_tpu.runtime.vertex_average import vertex_average

    mesh_path = REF_ROOT / "benchmarks" / "inputs" / mesh_file
    if not mesh_path.exists():
        # never substitute a different mesh: recorded history entries were
        # measured on the real R12 inputs
        raise FileNotFoundError(f"hard-rim benchmark input missing: {mesh_path}")
    data = load_data(str(mesh_path))
    mesh = parse_geometry(data)
    mesh.global_parameters.update(
        {
            "tilt_solve_mode": "coupled",
            "tilt_step_size": 0.15,
            "tilt_inner_steps": 40,
            "tilt_tol": 1e-10,
            "step_size": 0.005,
            "step_size_mode": "fixed",
        }
    )
    mn = Minimizer(mesh, quiet=True)
    mn.step_size = 0.005

    def refine_and_smooth():
        m = refine_polygonal_facets(mn.mesh)
        m = refine_triangle_mesh(m)
        mn.mesh = m
        mn.invalidate()
        mn.enforce_constraints_after_mesh_ops()
        for _ in range(5):
            vertex_average(mn.mesh)
        mn.mesh.increment_version()
        mn.invalidate()
        mn.enforce_constraints_after_mesh_ops()

    t0 = time.perf_counter()
    mn.minimize(40)
    refine_and_smooth()
    mn.minimize(100)
    refine_and_smooth()
    mn.minimize(120)
    dt = time.perf_counter() - t0
    mn._sync_host()
    z_span = float(np.ptp(np.array([v.position[2] for v in mn.mesh.vertices.values()])))
    assert np.isfinite(z_span) and z_span > 0.0, "invalid z-span"
    return dt, float(mn.compute_energy())


def run_hard_rim_bench():
    """Flagship hard-rim relaxation protocol on the pinned-disk mesh
    (reference benchmarks/benchmark_kozlov_1disk_3d_profile_hard_rim.py:
    43-77); see _hard_rim_protocol."""
    return _hard_rim_protocol("bench_kozlov_1disk_profile_hard_rim_R12.yaml")


def run_hard_rim_free_disk_bench():
    """Same flagship protocol with the disk rim FREE (reference
    benchmarks/benchmark_kozlov_1disk_3d_profile_hard_rim_free_disk.py)."""
    return _hard_rim_protocol(
        "bench_kozlov_1disk_profile_hard_rim_R12_free_disk.yaml"
    )


RUNNER_SCENARIOS = {
    "kozlov_tensionless": run_kozlov_tensionless,
    "kozlov_hard_rim_bench": run_hard_rim_bench,
    "kozlov_hard_rim_free_disk_bench": run_hard_rim_free_disk_bench,
    "kozlov_induction_quick": run_induction_quick,
    "bending_analytic": run_bending_analytic,
    "flat_disk_tilt_mass_mode": run_flat_disk_tilt_mass_mode,
    "tilt_relaxation": run_tilt_relaxation,
    "annulus_decay_length": run_annulus_decay_length,
    "volume_optimization": run_volume_optimization,
    "kozlov_free_disk_light": run_free_disk_light,
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

    if name in RUNNER_SCENARIOS:
        return RUNNER_SCENARIOS[name]()

    mesh, instructions = load_scenario(name)
    minim = Minimizer(mesh, quiet=quiet)
    from membrane_solver_tpu.runtime.capacity_plan import plan_for_instructions

    minim.capacity_floors = plan_for_instructions(mesh, instructions)
    ctx = CommandContext(mesh=mesh, minimizer=minim)
    t0 = time.perf_counter()
    for line in instructions:
        execute_command_line(ctx, str(line))
        ctx.sync_mesh()
    elapsed = time.perf_counter() - t0
    return elapsed, float(ctx.minimizer.compute_energy())


COLD_RESULTS = REPO / "benchmarks" / "cold_process.json"


def run_cold(names: list[str], platform: str | None, runs: int) -> dict:
    """Cold-process protocol: each run executes the scenario in a FRESH
    subprocess and the reported time is the whole process wall-clock —
    interpreter start, imports, cache loads, everything.  This is the
    reference's own measurement protocol (its ``benchmarks/benchmark_*.py``
    spawn ``main.py`` per run, e.g. benchmark_cube_good.py:26-56), so the
    numbers are directly comparable to the reference's same-host averages
    in BASELINE.md.  The in-process timings printed by the default suite
    mode measure the warm steady state instead; README reports both."""
    import subprocess
    import time as _time

    out = {}
    for name in names:
        code = (
            f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
            + (
                f"import jax; jax.config.update('jax_platforms', {platform!r})\n"
                if platform
                else ""
            )
            + f"from tools.suite import run_scenario\n"
            f"elapsed, energy = run_scenario({name!r})\n"
            f"print('COLD_E', energy)\n"
        )
        best = float("inf")
        energy = None
        for _ in range(max(runs, 1)):
            t0 = _time.perf_counter()
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=3600,
            )
            dt = _time.perf_counter() - t0
            if proc.returncode != 0:
                print(f"{name:22s} FAILED:\n{proc.stdout[-800:]}\n{proc.stderr[-800:]}")
                break
            best = min(best, dt)
            for line in proc.stdout.splitlines():
                if line.startswith("COLD_E"):
                    energy = float(line.split()[1])
        else:
            out[name] = {
                "cold_seconds": round(best, 4),
                "energy": energy,
                "platform": platform or "default",
                "recorded": time.strftime("%Y-%m-%d"),
            }
            print(f"{name:22s} {best:8.3f}s cold-process  E={energy:.10g}")
    merged = json.loads(COLD_RESULTS.read_text()) if COLD_RESULTS.exists() else {}
    merged.update(out)
    COLD_RESULTS.write_text(json.dumps(merged, indent=1) + "\n")
    return out


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
    ap.add_argument("--cold", action="store_true",
                    help="cold-process protocol: fresh subprocess per run, "
                    "whole-process wall-clock (the reference's own "
                    "benchmark() methodology); writes "
                    "benchmarks/cold_process.json")
    args = ap.parse_args(argv)

    known = set(SCENARIOS) | set(RUNNER_SCENARIOS)
    names = args.names or list(SCENARIOS) + list(RUNNER_SCENARIOS)
    unknown = [n for n in names if n not in known]
    if unknown:
        print(f"unknown scenarios: {unknown}; known: {sorted(known)}")
        return 2
    if not REF_ROOT.exists():
        skipped = [n for n in names if n in RUNNER_SCENARIOS and n != "volume_optimization"]
        if skipped:
            print(f"reference not mounted; skipping {skipped}")
        names = [n for n in names if n not in skipped]
    if args.cold:
        run_cold(names, args.platform, args.runs)
        return 0

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

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

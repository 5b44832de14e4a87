#!/usr/bin/env python3
"""Recorded evidence for the two reference pathologies this solver diverges from.

Runs the MOUNTED reference implementation (read-only, in-process) on the
kozlov hard-rim lane and records:

1. **Singular shape-KKT**.  With a disk group the reference stacks the
   in-condition rim shape rows as EXACT negations of the out rows
   (reference modules/constraints/rim_slope_match_gradients.py:374-390), so
   its joint KKT normal matrix A = C C^T (+1e-18 I) is exactly singular.
   We instrument runtime/constraint_projection._solve_kkt_system and record,
   per solve: the matrix size, its condition number / smallest singular
   value, whether the solve returned None (projection skipped) or produced
   multipliers, and their magnitude.  Enormous or skipped multipliers mean
   the reference's shape gradient is either unprojected or corrupted —
   which is why its line search rejects every trial and the lane stalls at
   the tilt-relaxed energy ~39.4900768958 while this solver (which drops
   the span-duplicate rows) descends cleanly to 38.6819516020 in the same
   10 steps.

2. **Stale-cache energy pollution**.  Past the stall the reference descends
   only because, after a failed line search, its in-place evaluator scores
   the bit-identically restored state differently from a fresh evaluation
   of the same geometry.  We record, per outer step, the in-place energy
   vs the energy of a freshly re-parsed copy of the same state and report
   the largest mismatch (~1.9e-2 expected).

Writes ``tests/fixtures/ref_kkt_pathology.json``.  Requires the reference
checkout at /root/reference (skips gracefully without it).
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

import numpy as np

REF = os.environ.get("MEMBRANE_REFERENCE_ROOT", "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "ref_kkt_pathology.json"

BENCH_GP = {
    "tilt_solve_mode": "coupled",
    "tilt_step_size": 0.15,
    "tilt_inner_steps": 40,
    "tilt_tol": 1e-10,
    "step_size": 0.005,
    "step_size_mode": "fixed",
}


def main() -> None:
    if not os.path.isdir(REF):
        print(json.dumps({"skipped": f"reference not found at {REF}"}))
        return
    sys.path.insert(0, REF)

    from geometry.geom_io import load_data, parse_geometry
    from runtime import constraint_projection as cp
    from runtime.constraint_manager import ConstraintModuleManager
    from runtime.energy_manager import EnergyModuleManager
    from runtime.minimizer import Minimizer
    from runtime.steppers.gradient_descent import GradientDescent

    mesh_path = os.path.join(
        REF, "benchmarks", "inputs", "bench_kozlov_1disk_profile_hard_rim_R12.yaml"
    )

    def build():
        mesh = parse_geometry(load_data(mesh_path))
        mesh.global_parameters.update(BENCH_GP)
        return mesh, Minimizer(
            mesh,
            mesh.global_parameters,
            GradientDescent(),
            EnergyModuleManager(mesh.energy_modules),
            ConstraintModuleManager(mesh.constraint_modules),
            quiet=True,
        )

    report: dict = {"lane": os.path.basename(mesh_path), "gp": BENCH_GP}

    # ------------------------------------------------------------------
    # pathology 1: singular joint KKT normal matrix
    # ------------------------------------------------------------------
    solves: list[dict] = []
    orig_solve = cp._solve_kkt_system

    def instrumented(A, b):
        lam = orig_solve(A, b)
        if len(solves) < 200:
            s = np.linalg.svd(A, compute_uv=False)
            smin = float(s[-1]) if s.size else 0.0
            smax = float(s[0]) if s.size else 0.0
            solves.append(
                {
                    "k": int(A.shape[0]),
                    "sigma_min": smin,
                    "sigma_max": smax,
                    "skipped": lam is None,
                    "max_abs_lambda": None if lam is None else float(np.abs(lam).max()),
                }
            )
        return lam

    cp._solve_kkt_system = instrumented
    try:
        mesh, minim = build()
        with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
            minim.minimize(n_steps=10)
        E10 = float(minim.compute_energy())
    finally:
        cp._solve_kkt_system = orig_solve

    degenerate = [s for s in solves if s["skipped"] or (s["max_abs_lambda"] or 0) > 1e6]
    report["singular_kkt"] = {
        "energy_after_10_steps": E10,
        "n_solves_observed": len(solves),
        "n_degenerate": len(degenerate),
        "worst": max(
            solves,
            key=lambda s: (s["skipped"], s["max_abs_lambda"] or 0.0),
            default=None,
        ),
        "sample": solves[:8],
        "our_energy_after_10_steps": 38.68195160202414,
    }

    # direct structural evidence: the stacked rows contain exact +/- pairs
    try:
        from modules.constraints import rim_slope_match_gradients as rg

        mesh2, minim2 = build()
        mesh2.build_position_cache()
        rows = rg.constraint_gradients_rows_array(
            mesh2,
            mesh2.global_parameters,
            positions=mesh2.positions_view(),
            index_map=mesh2.vertex_index_to_row,
        )
        n_pairs = 0
        if rows:
            seen = {}
            for r, v in rows:
                key = tuple(np.asarray(r).tolist())
                for prev in seen.get(key, []):
                    if np.array_equal(prev, -np.asarray(v)):
                        n_pairs += 1
                seen.setdefault(key, []).append(np.asarray(v))
        report["singular_kkt"]["exact_negated_row_pairs"] = int(n_pairs)
        report["singular_kkt"]["n_rim_rows"] = 0 if not rows else len(rows)
    except Exception as exc:  # pragma: no cover - diagnostic only
        report["singular_kkt"]["row_scan_error"] = repr(exc)

    # ------------------------------------------------------------------
    # pathology 2: stale-cache energy pollution past the stall
    # ------------------------------------------------------------------
    from geometry.geom_io import save_geometry

    mesh3, minim3 = build()
    steps = []
    worst = {"step": None, "mismatch": 0.0}
    with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
        for step in range(40):
            minim3.minimize(n_steps=1)
            e_inplace = float(minim3.compute_energy())
            # fresh evaluation of the same state: serialize + re-parse
            tmp = "/tmp/_ref_state_probe.json"
            save_geometry(minim3.mesh, tmp)
            fresh_mesh = parse_geometry(load_data(tmp))
            fresh_mesh.global_parameters.update(BENCH_GP)
            fresh = Minimizer(
                fresh_mesh,
                fresh_mesh.global_parameters,
                GradientDescent(),
                EnergyModuleManager(fresh_mesh.energy_modules),
                ConstraintModuleManager(fresh_mesh.constraint_modules),
                quiet=True,
            )
            e_fresh = float(fresh.compute_energy())
            mism = abs(e_inplace - e_fresh)
            steps.append(
                {"step": step, "e_inplace": e_inplace, "e_fresh": e_fresh, "mismatch": mism}
            )
            if mism > worst["mismatch"]:
                worst = {"step": step, "mismatch": mism}
    report["stale_cache"] = {
        "worst_mismatch": worst,
        "final_inplace_energy": steps[-1]["e_inplace"] if steps else None,
        "final_fresh_energy": steps[-1]["e_fresh"] if steps else None,
        "trace_tail": steps[-10:],
    }

    # ------------------------------------------------------------------
    # pathology 3: within-call stale curvature cache (bending lane)
    # ------------------------------------------------------------------
    bend_path = os.path.join(REF, "benchmarks", "inputs", "bench_bending_analytic.json")

    def bending_run(n_calls, steps_per_call, flush):
        mesh = parse_geometry(load_data(bend_path))
        mn = Minimizer(
            mesh, mesh.global_parameters, GradientDescent(),
            EnergyModuleManager(["bending"]), ConstraintModuleManager(["volume"]),
            quiet=True,
        )
        mn.step_size = float(mesh.global_parameters.get("step_size"))
        cb = None
        if flush:
            def cb(m, i):
                m._curvature_cache = {}
                m._curvature_version = -1
        with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
            for _ in range(n_calls):
                mn.minimize(steps_per_call, callback=cb)
        return float(mn.compute_energy())

    report["stale_curvature_cache"] = {
        "minimize_5": bending_run(1, 5, flush=False),
        "minimize_1_x5": bending_run(5, 1, flush=False),
        "minimize_5_with_per_step_flush": bending_run(1, 5, flush=True),
        "note": (
            "one g5 call disagrees with five g1 calls of the same protocol; "
            "flushing the curvature cache per iteration (the reference's own "
            "pre-report hygiene) reproduces the per-step value, which equals "
            "this solver's trajectory to 1 ulp"
        ),
    }

    # ------------------------------------------------------------------
    # pathology 4: stale-view enforcement pass (dented_cube lane)
    # ------------------------------------------------------------------
    dent_path = os.path.join(REF, "benchmarks", "inputs", "bench_dented_cube.json")
    mesh = parse_geometry(load_data(dent_path))
    mn = Minimizer(
        mesh, mesh.global_parameters, GradientDescent(),
        EnergyModuleManager(mesh.energy_modules),
        ConstraintModuleManager(mesh.constraint_modules), quiet=True,
    )
    body = list(mesh.bodies.values())[0]
    v_before = float(body.compute_volume(mesh))
    with redirect_stdout(io.StringIO()), redirect_stderr(io.StringIO()):
        mn.enforce_constraints_after_mesh_ops(mesh)
    mesh.increment_version()
    v_after = float(body.compute_volume(mesh))
    report["stale_view_enforcement"] = {
        "volume_before": v_before,
        "volume_after_hard_projection_pass": v_after,
        "target_volume": float(body.target_volume),
        "note": (
            "the pin projection dents the cube inside the same enforcement "
            "pass, but the volume module reads a stale positions view and "
            "leaves the body at half its target volume despite the pass "
            "being documented as a hard projection back to the target"
        ),
    }

    OUT.write_text(json.dumps(report, indent=2))
    print(json.dumps({
        "wrote": str(OUT),
        "stall_energy_10_steps": E10,
        "degenerate_solves": len(degenerate),
        "worst_stale_mismatch": worst,
        "bending": report["stale_curvature_cache"],
        "dented_cube_volume": [v_before, v_after],
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: per-minimization-step wall-clock on the kozlov
1-disk hard-rim coupled-tilt lane (BASELINE.json's headline config).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline: the NumPy reference (`AvishaiBarnoy/membrane_solver`) on this host
runs the same lane (coupled tilt solve, 40 inner CG iterations, fixed 0.005
Armijo steps) at 117.73 ms/step over 40 warm steps (measured 2026-08-16).
vs_baseline is the speedup factor (reference_time / our_time).

One "step" = one full outer iteration: inner leaflet-tilt relaxation (up to
40 preconditioned CG iterations with KKT-projected gradients and per-step
rim re-enforcement), energy+gradient assembly, KKT shape projection, and a
10-trial Armijo line search with per-trial constraint enforcement — all as a
single jitted lax.while_loop program.

The headline lane is the L3 refinement (10.8k vertices) measured on the
real TPU in float32 — the TPU high-throughput mode.  The f32-vs-f64
trajectory deviation is NOT a single number: it is recorded per lane on
hardware in benchmarks/f32_parity.json (tools/f32_parity_probe.py) — cite
that file, not this docstring, for the current bounds.  The 1e-8
reference-parity lanes run f64 on CPU, where the full suite passes.
XLA:CPU f64 is measured alongside as the robust comparison; the L3/L4
headline is the TPU number when measured.  The SMALL kozlov lane's
headline is the backend `utils/placement.py` actually routes it to (auto
placement sends sub-2k-row problems to the co-resident XLA:CPU — a TPU
number would describe a backend the framework would not use there); both
backends are still recorded side by side in "all".  Small-lane times are
host-sensitive: fleet VM migrations move this repo between hosts whose
wall-clock differs 2-3x (BASELINE.md §re-measurements), so compare
same-round numbers, not rounds.  Set BENCH_LANE=cube770 for the
surface-tension lane, BENCH_PLATFORM=cpu/tpu to pin a backend,
BENCH_STEPS to change duration, BENCH_F64=1 to force float64 everywhere.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _kozlov_input() -> str:
    """Repo-local meshgen-generated lane by default; the read-only reference
    fixture only behind an explicit opt-in (exact parity runs)."""
    ref = "/root/reference/benchmarks/inputs/bench_kozlov_1disk_profile_hard_rim_R12.yaml"
    if os.environ.get("MEMBRANE_USE_REFERENCE_INPUTS") == "1" and os.path.exists(ref):
        return ref
    gen = "/tmp/membrane_bench_kozlov.json"
    if not os.path.exists(gen):
        sys.path.insert(0, str(REPO))
        from membrane_solver_tpu.meshgen import build

        with open(gen, "w") as fh:
            json.dump(build("kozlov_1disk"), fh)
    return gen


LANES = {
    "kozlov": {
        "path": _kozlov_input(),
        "gp": {
            "tilt_solve_mode": "coupled",
            "tilt_step_size": 0.15,
            "tilt_inner_steps": 40,
            "tilt_tol": 1e-10,
            "step_size": 0.005,
            "step_size_mode": "fixed",
        },
        "step_size": 0.005,
        "metric": "kozlov_hard_rim_per_step_ms",
        "reference_ms": 117.73,
        "steps": 40,
        "warmup": 2,
    },
    "cube770": {
        "path": str(REPO / "benchmarks" / "inputs" / "cube_770.json"),
        "gp": {},
        "step_size": 0.028159473742371446,
        "metric": "cube770_gd_per_step_ms",
        "reference_ms": 17.527,
        "steps": 200,
        "warmup": 5,
    },
}

# the headline: the kozlov_1disk_3d lane refined to production scale
# (10,817 vertices after the lane's three refinement passes — verified
# identical vertex/facet counts on both solvers).  reference_ms is the
# NumPy reference re-measured on THIS mesh on this host 2026-08-20
# (unloaded, 22.4-30.2 s/step across two clean processes; the minimum is
# used as the most conservative bar — benchmarks/ref_l3_remeasure.json).
# It supersedes the 16,260.5 recorded 2026-08-16, which was taken when
# the same lane produced a 6,577-vertex mesh (meshgen's kozlov_1disk
# initial mesh has since grown; the reference's dense KKT stack goes
# quadratic in mesh size).  Same protocol position, same coupled
# 40-iteration inner tilt solve.
LANES["kozlov_L3"] = {
    **LANES["kozlov"],
    "metric": "kozlov3d_L3_per_step_ms",
    "reference_ms": 22434.0,
    "refines": 3,
    "steps": 20,
    "warmup": 2,
    "timeout": 3000,
}

# L4 scaling lane (26,209 vertices): the reference NumPy stack measured
# 165 s/step on this host (recorded round 1, "L4 scaling measurement"
# commit); opt-in via BENCH_LANE=kozlov_L4 — not part of the default
# headline run (compile + 10 steps keep it within the lane timeout).
LANES["kozlov_L4"] = {
    **LANES["kozlov"],
    "metric": "kozlov3d_L4_per_step_ms",
    "reference_ms": 165000.0,
    "refines": 4,
    "steps": 10,
    "warmup": 1,
    "timeout": 5400,
}


def measure(lane: dict, platform: str | None, x64: str = "1") -> float:
    """Run one lane in a subprocess (clean backend + dtype); return ms/step."""
    refines = int(lane.get("refines", 0))
    code = f"""
import json, time, sys
sys.path.insert(0, {str(REPO)!r})
import jax
if {platform!r} != "None":
    jax.config.update("jax_platforms", {platform!r})
from membrane_solver_tpu import Minimizer, load_data, parse_geometry
lane = {json.dumps(lane)}
mesh = parse_geometry(load_data(lane["path"]))
mesh.global_parameters.update(lane["gp"])
mn = Minimizer(mesh, quiet=True)
mn.step_size = lane["step_size"]
if {refines}:
    from membrane_solver_tpu.runtime.refinement import refine_polygonal_facets, refine_triangle_mesh
    for _ in range({refines}):
        m = refine_polygonal_facets(mn.mesh); m = refine_triangle_mesh(m)
        mn.mesh = m; mn.invalidate(); mn.enforce_constraints_after_mesh_ops()
steps = int({os.environ.get("BENCH_STEPS", 0)!r}) or lane["steps"]
mn.minimize(lane["warmup"])
# best-of-2 timed passes: robust to transient host load.  A pass that
# converges or zero-step-terminates early runs cheaper-than-full steps, so
# it only counts when no full pass completed (avoids biasing ms/step down).
best_full = float("inf")
best_any = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    res = mn.minimize(steps)
    dt = time.perf_counter() - t0
    iters = max(int(res.get("iterations", steps)), 1)
    per_step = dt / iters
    best_any = min(best_any, per_step)
    if res.get("terminated_early") or res.get("converged"):
        break  # the state is converged; a further pass measures nothing real
    best_full = min(best_full, per_step)
best = best_full if best_full < float("inf") else best_any
print("BENCH_RESULT", best * 1e3)
"""
    # pin the backend so a "tpu" number is always a TPU number: the
    # latency-aware auto-placement (utils/placement.py) would otherwise
    # route the small lane to XLA:CPU
    env = dict(os.environ, MEMBRANE_SOLVER_X64=x64, MEMBRANE_SOLVER_BACKEND="default")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=int(lane.get("timeout", 1800)),
    )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"bench subprocess failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def run_lane(lane: dict, configs) -> dict:
    """configs: iterable of (label, platform, x64)."""
    results = {}
    for label, plat, x64 in configs:
        try:
            results[label] = measure(lane, plat, x64)
        except Exception:
            continue
    return results


_TPU_ALIVE = None
_PROBE_LOG: list[str] = []


def _tpu_alive() -> bool:
    """Probe the accelerator with bounded retry-with-backoff.

    The axon tunnel can wedge so hard that jax.devices() blocks forever
    (seen 2026-08-17 after a VM migration); without this probe every TPU
    lane would burn its full subprocess timeout before falling back.
    Round-3's BENCH artifact regressed to cpu_f64 because the single
    probe hit a transient outage — so the probe now retries (clean
    failures get up to 3 attempts over ~10 min; a hung attempt is
    abandoned, never killed, because a mid-init kill can wedge a
    slow-but-alive tunnel) and its transcript is recorded in the JSON
    output so the artifact shows WHY a CPU-only record happened.
    """
    global _TPU_ALIVE
    if _TPU_ALIVE is None:
        from membrane_solver_tpu.utils.backend_probe import probe_accelerator

        budget = float(os.environ.get("BENCH_PROBE_BUDGET", "600"))
        _TPU_ALIVE = probe_accelerator(
            budget_s=budget, max_attempts=3, retry_backoff_s=60.0,
            use_cache=False, transcript=_PROBE_LOG,
        )
        if not _TPU_ALIVE:
            print("bench: accelerator unreachable; CPU lanes only", file=sys.stderr)
    return _TPU_ALIVE


def _default_configs(pin):
    force_f64 = os.environ.get("BENCH_F64") == "1"
    if pin:
        return [(pin, pin, "1" if force_f64 else ("0" if pin != "cpu" else "1"))]
    cfgs = [("tpu_f32", "None", "0"), ("cpu_f64", "cpu", "1")]
    if force_f64:
        cfgs = [("tpu_f64", "None", "1"), ("cpu_f64", "cpu", "1")]
    if not _tpu_alive():
        cfgs = [c for c in cfgs if not c[0].startswith("tpu")]
    return cfgs


def _headline(results: dict) -> tuple[str, float]:
    """Headline = the TPU number when measured (the platform this framework
    targets; its f32 mode is documented with a recorded trajectory-parity
    bound), never a silent min() across precisions.  Every measured config
    is still reported side by side in "all"."""
    tpu = {k: v for k, v in results.items() if k.startswith("tpu")}
    pool = tpu or results
    return min(pool.items(), key=lambda kv: kv[1])


def main() -> None:
    lane_name = os.environ.get("BENCH_LANE")
    pin = os.environ.get("BENCH_PLATFORM")

    if lane_name:  # explicit lane: run it on the pinned or both platforms
        if lane_name not in LANES:
            sys.exit(f"error: unknown BENCH_LANE {lane_name!r}; choose from {sorted(LANES)}")
        lane = LANES[lane_name]
        results = run_lane(lane, _default_configs(pin))
        if not results:
            sys.exit("error: all bench platforms failed")
        platform, ms = _headline(results)
        out = {
            "metric": lane["metric"],
            "value": round(ms, 4),
            "unit": "ms/step",
            "vs_baseline": round(lane["reference_ms"] / ms, 2),
            "platform": platform,
            "all": {k: round(v, 3) for k, v in results.items()},
        }
        if _PROBE_LOG:
            out["probe"] = _PROBE_LOG
        print(json.dumps(out))
        return

    # default: headline = production-scale kozlov L3 lane on the TPU in
    # float32 (the high-throughput mode), with XLA:CPU float64 measured
    # alongside; the faster backend is reported and labeled.  The small
    # hard-rim lane is measured on both and reported alongside.
    extras = {}
    small = run_lane(LANES["kozlov"], _default_configs(pin))
    for label, ms in small.items():
        extras[f"kozlov_small_{label}"] = round(ms, 3)

    l3 = run_lane(LANES["kozlov_L3"], _default_configs(pin))
    if l3:
        platform, ms = _headline(l3)
        lane = LANES["kozlov_L3"]
        for label, v in l3.items():
            extras[f"kozlov_L3_{label}"] = round(v, 3)
    elif small:
        platform, ms = _headline(small)
        lane = LANES["kozlov"]
    else:
        sys.exit("error: all bench lanes failed")
    if small:
        # the small lane (436 vertices, padded 512 rows) is auto-routed to
        # XLA:CPU by utils/placement.py (<= 2048-row threshold) in real
        # use, so its headline is the placement-chosen backend — the TPU
        # number stays visible in kozlov_small_tpu_* above
        placed = {k: v for k, v in small.items() if k.startswith("cpu")} or small
        sp, sms = min(placed.items(), key=lambda kv: kv[1])
        extras["kozlov_small_platform"] = f"{sp} (placement auto)"
        extras["kozlov_small_vs_baseline"] = round(
            LANES["kozlov"]["reference_ms"] / sms, 2
        )
    out = {
        "metric": lane["metric"],
        "value": round(ms, 4),
        "unit": "ms/step",
        "vs_baseline": round(lane["reference_ms"] / ms, 2),
        "platform": platform,
        "all": extras,
    }
    if _PROBE_LOG:
        out["probe"] = _PROBE_LOG
    print(json.dumps(out))


if __name__ == "__main__":
    main()

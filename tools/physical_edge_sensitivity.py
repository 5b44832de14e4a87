#!/usr/bin/env python
"""Reference self-sensitivity of the physical-edge parity protocol.

Round-5 verdict item 2: the physical-edge lanes reproduce thetaB at 1e-12
but carry a final-energy residual (i50 3.5e-3, i60 1.7e-3, near_edge
5.2e-3) vs the recorded reference baselines.  The recorded window traces
(benchmarks/physical_edge_window_*.json) locate the first real divergence
at g10 step 5 — the first ACCEPTED step after four rejected ones — where
the repo's accepted energy jumps from ~2e-10 agreement to 2.8e-6; by g8
entry the states differ 5.6e-5 and the reference's borderline step-1
Armijo accept flips.  Two hypotheses: (a) a residual semantics gap in the
accept machinery, or (b) floating-point-order noise (XLA vs NumPy
summation orders, inherently different) amplified through the protocol's
discrete accept/reject branches.

This tool decides between them WITHOUT the repo in the loop: it runs the
REFERENCE solver against itself on the same lane, once untouched and once
with an epsilon perturbation (one vertex, or --mode all for an
alternating-sign 1e-10 pattern on every interior vertex), and records the
per-step accepted-energy trace plus the final protocol energy of both.

RECORDED OUTCOME (2026-08-19, benchmarks/physical_edge_sensitivity_*.json):
the reference is STABLE — eps=1e-13 single-vertex: final-energy delta 0,
zero flips; eps=1e-10 on ALL interior vertices: final delta 4.8e-9, zero
accept flips.  That ruled OUT hypothesis (b) and redirected the round-5
investigation to hypothesis (a), which terminated at the reference's
cache-warmth defect: its relax returns different results for
bit-identical logical state depending on whether its lazy SoA caches are
warm or cold (tools/ref_cache_warmth_repro.py — the recorded exemption
evidence in BASELINE.md).

Usage:
    python tools/physical_edge_sensitivity.py [i50_interface] [--eps 1e-13]

Writes benchmarks/physical_edge_sensitivity_<lane>.json.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
FIXTURES = REF / "tests" / "fixtures"
PROTOCOL = ("g10", "r", "V2", "t5e-3", "g8", "t2e-3", "g12")

_REF_CODE = """
import json, sys
sys.path.insert(0, {ref!r})
from pathlib import Path
import numpy as np
from tools.reproduce_theory_parity import (
    _build_context,
    _stabilize_rim_radius_for_parity,
    _activate_local_outer_shell_for_parity,
    _release_parity_physical_edge_bump,
)
from commands.executor import execute_command_line

ctx = _build_context(Path({fixture!r}))
eps = {eps!r}
mode = {mode!r}
if eps:
    mesh = ctx.mesh
    plain = [vid for vid, v in sorted(mesh.vertices.items())
             if not (getattr(v, "options", None) or {{}})]
    if mode == "one":
        # deterministic interior vertex: the largest id carrying no options
        targets = plain[-1:] if plain else [sorted(mesh.vertices)[-1]]
    else:
        targets = plain
    for j, vid in enumerate(targets):
        # alternating-sign z pattern: not removable by a rigid shift
        mesh.vertices[vid].position[2] += eps * (1 if j % 2 == 0 else -1)
    mesh.increment_version()
    print(f"perturbed {{len(targets)}} vertices by +-{{eps}}", file=sys.stderr)

# the exact parity-activation protocol loop (reference
# _run_protocol_with_parity_activation), with a purely observational
# stepper.step wrap recording every accepted energy (the reference's own
# print path would perturb the trajectory; this wrap only reads returns)
trace = []
orig_step = ctx.minimizer.stepper.step

def recording_step(mesh, grad, step_size_in, energy_fn, **kw):
    ok, new_step, E = orig_step(mesh, grad, step_size_in, energy_fn, **kw)
    trace.append([bool(ok), float(E)])
    return ok, new_step, E

ctx.minimizer.stepper.step = recording_step

_stabilize_rim_radius_for_parity(ctx.mesh)
ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)
bump_released = False
for cmd_index, cmd in enumerate({protocol!r}):
    execute_command_line(ctx, cmd)
    if cmd_index == 0 and not bump_released:
        bump_released = _release_parity_physical_edge_bump(ctx.mesh)
    _stabilize_rim_radius_for_parity(ctx.mesh)
    ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)

final_energy = float(ctx.minimizer.compute_energy())
thetaB = ctx.mesh.global_parameters.get("tilt_thetaB_value")
print("SENS_RESULT " + json.dumps({{
    "final_energy": final_energy,
    "thetaB": None if thetaB is None else float(thetaB),
    "trace": trace,
}}))
"""


def _run_ref(fixture: str, eps: float, mode: str = "one") -> dict:
    code = _REF_CODE.format(
        ref=str(REF), fixture=fixture, eps=eps, mode=mode, protocol=PROTOCOL
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("SENS_RESULT "):
            return json.loads(line[len("SENS_RESULT "):])
    raise RuntimeError(
        f"reference run failed (rc {out.returncode}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("lane", nargs="?", default="i50_interface",
                    choices=["i50_interface", "i60_interface", "near_edge_v1"])
    ap.add_argument("--eps", type=float, default=1e-13)
    ap.add_argument("--mode", choices=["one", "all"], default="one")
    args = ap.parse_args(argv)

    fixture = str(
        FIXTURES / f"kozlov_1disk_3d_free_disk_theory_parity_{args.lane}.yaml"
    )
    base = _run_ref(fixture, 0.0, args.mode)
    pert = _run_ref(fixture, args.eps, args.mode)

    # first divergent accept + divergence growth along the trace
    first_flip = None
    growth = []
    for i, (a, b) in enumerate(zip(base["trace"], pert["trace"])):
        d = abs(a[1] - b[1])
        growth.append(d)
        if first_flip is None and a[0] != b[0]:
            first_flip = i
    dE = abs(base["final_energy"] - pert["final_energy"])
    rel = dE / max(abs(base["final_energy"]), 1e-30)

    out = {
        "lane": args.lane,
        "eps": args.eps,
        "mode": args.mode,
        "protocol": list(PROTOCOL),
        "base_final_energy": base["final_energy"],
        "perturbed_final_energy": pert["final_energy"],
        "final_energy_abs_delta": dE,
        "final_energy_rel_delta": rel,
        "base_thetaB": base.get("thetaB"),
        "perturbed_thetaB": pert.get("thetaB"),
        "first_accept_flip_step": first_flip,
        "trace_abs_delta": growth,
        "base_trace": base["trace"],
        "perturbed_trace": pert["trace"],
    }
    dest = REPO / "benchmarks" / f"physical_edge_sensitivity_{args.lane}_{args.mode}.json"
    dest.write_text(json.dumps(out, indent=1))
    print(f"lane {args.lane}: eps={args.eps:g} -> |dE_final|={dE:.3e} "
          f"(rel {rel:.3e}); first accept flip at trace step {first_flip}; "
          f"divergence at steps 5/10/20: "
          f"{[f'{growth[i]:.2e}' for i in (5, 10, 20) if i < len(growth)]}")
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

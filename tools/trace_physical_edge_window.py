#!/usr/bin/env python
"""Per-step Armijo-accept trace of the physical-edge g10 window, both solvers.

The i50/i60/near_edge physical-edge lanes reproduce thetaB exactly but
carry a ~1.6e-2 final-energy residual that the acceptance test pins at
2.5e-2 (tests/test_theory_parity_acceptance.py).  The docstring there
attributes it to "slightly different Armijo sequences" in the pre-refine
g10 window.  This tool records, for both solvers, the accepted step size
and accepted energy after every outer iteration of that window, so the
FIRST divergent accept can be located and the residual either fixed or
attributed precisely.

Reference side: wraps `stepper.step` (purely observational — the
reference's own per-step print path clears curvature caches and
re-evaluates energy, which PERTURBS its trajectory, reference
runtime/minimizer.py:1405-1414; the wrap records only the values the
minimizer already computed).  Repo side: runs the same window as g1
singles recording step size + clean energy (pure functions, probing is
free), plus an optional block-equivalence self-check.

Usage:
    python tools/trace_physical_edge_window.py i50_interface --steps 10
    python tools/trace_physical_edge_window.py i50_interface --selfcheck

Writes benchmarks/physical_edge_window_<lane>.json.
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

_REF_CODE = """
import json, sys
sys.path.insert(0, {ref!r})
from pathlib import Path
from tools.reproduce_theory_parity import (
    _build_context,
    _stabilize_rim_radius_for_parity,
    _activate_local_outer_shell_for_parity,
    _release_parity_physical_edge_bump,
)
from commands.executor import execute_command_line

ctx = _build_context(Path({fixture!r}))
_stabilize_rim_radius_for_parity(ctx.mesh)
ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)

# protocol prefix with the parity-activation loop semantics (reference
# _run_protocol_with_parity_activation:289-296)
bump_released = False
for cmd_index, cmd in enumerate({prefix!r}):
    execute_command_line(ctx, cmd)
    if cmd_index == 0 and not bump_released:
        bump_released = _release_parity_physical_edge_bump(ctx.mesh)
    _stabilize_rim_radius_for_parity(ctx.mesh)
    ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)

trace = []
orig_step = ctx.minimizer.stepper.step

def recording_step(mesh, grad, step_size_in, energy_fn, **kw):
    ok, new_step, E = orig_step(mesh, grad, step_size_in, energy_fn, **kw)
    trace.append({{
        "ok": bool(ok),
        "step_in": float(step_size_in),
        "step_out": float(new_step),
        "accepted_E": float(E),
    }})
    return ok, new_step, E

ctx.minimizer.stepper.step = recording_step
execute_command_line(ctx, "g" + str({steps}))
print("WINDOW_TRACE " + json.dumps(trace))
"""

_REPO_CODE = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from tools.reproduce_theory_parity import (
    build_context, stabilize_rim_radius, activate_physical_edge_bump,
)
from membrane_solver_tpu.commands.executor import execute_command_line
import membrane_solver_tpu.runtime.jit_core as jc
import membrane_solver_tpu.runtime.minimizer as mz

# Purely observational per-block stats recorder.  On theta-scan lanes the
# host loop already drives the jitted block one step at a time
# (minimizer.py chunk = min(chunk, every - ...)), so each block call IS one
# outer iteration and stats.accepted_energy is the same quantity the
# reference's stepper.step returns (ls.energy == reference line_search
# accepted trial energy).
trace = []
_orig_block = jc.minimize_block
_recording = True

def _recording_block(spec, options):
    blk = _orig_block(spec, options)
    def call(*a, **k):
        st, ss, stats = blk(*a, **k)
        if _recording and int(stats.iterations) > 0:
            trace.append({{
                "iters": int(stats.iterations),
                "accepted_E": float(stats.accepted_energy),
                "step_out": float(stats.step_size),
                "ok": bool(stats.step_success),
            }})
        return st, ss, stats
    return call

jc.minimize_block = _recording_block
mz.jit_core.minimize_block = _recording_block

ctx = build_context(Path({fixture!r}))
stabilize_rim_radius(ctx.mesh)
activate_physical_edge_bump(ctx.mesh)

# protocol prefix with the parity-activation loop (run_protocol semantics);
# recording only starts with the traced segment
from tools.reproduce_theory_parity import release_physical_edge_bump
_recording = False
bump_released = False
for cmd_index, cmd in enumerate({prefix!r}):
    execute_command_line(ctx, cmd)
    ctx.sync_mesh()
    if cmd_index == 0 and not bump_released:
        bump_released = release_physical_edge_bump(ctx.mesh)
    stabilize_rim_radius(ctx.mesh)
    activate_physical_edge_bump(ctx.mesh)
_recording = True

execute_command_line(ctx, "g" + str({steps}))
ctx.sync_mesh()
trace.append({{"block_final_E": float(ctx.minimizer.compute_energy())}})
print("WINDOW_TRACE " + json.dumps(trace))
"""


def _run(code: str, timeout: int = 3600) -> list:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout
    )
    for line in out.stdout.splitlines():
        if line.startswith("WINDOW_TRACE "):
            return json.loads(line[len("WINDOW_TRACE "):])
    raise RuntimeError(
        f"trace subprocess failed (rc {out.returncode}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


PROTOCOL = ("g10", "r", "V2", "t5e-3", "g8", "t2e-3", "g12")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("lane", nargs="?", default="i50_interface",
                    choices=["i50_interface", "i60_interface", "near_edge_v1"])
    ap.add_argument("--steps", type=int, default=None,
                    help="steps to trace (default: the segment's own count)")
    ap.add_argument("--segment", type=int, default=0,
                    help="protocol command index to trace (0=g10, 4=g8, "
                    "6=g12); the commands before it run as an untraced "
                    "prefix with the parity-activation loop")
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args(argv)

    seg_cmd = PROTOCOL[args.segment]
    if not seg_cmd.startswith("g"):
        raise SystemExit(f"segment {args.segment} ({seg_cmd}) is not a g-command")
    steps = args.steps if args.steps is not None else int(seg_cmd[1:])
    prefix = PROTOCOL[: args.segment]

    fixture = str(
        FIXTURES / f"kozlov_1disk_3d_free_disk_theory_parity_{args.lane}.yaml"
    )
    out = {"lane": args.lane, "steps": steps, "segment": args.segment,
           "prefix": list(prefix), "fixture": fixture}

    repo_trace = _run(_REPO_CODE.format(
        repo=str(REPO), fixture=fixture, steps=steps, prefix=prefix))
    repo_steps = [t for t in repo_trace if "accepted_E" in t]
    out["repo"] = repo_trace

    if not args.skip_reference and REF.exists():
        ref = _run(_REF_CODE.format(
            ref=str(REF), fixture=fixture, steps=steps, prefix=prefix))
        out["reference"] = ref
        print(f"{'i':>3} {'ref step_out':>14} {'ref accepted_E':>18} "
              f"{'repo accepted_E':>18} {'rel dev':>10}")
        for i in range(min(len(ref), len(repo_steps))):
            a, b = ref[i]["accepted_E"], repo_steps[i]["accepted_E"]
            rel = abs(a - b) / max(abs(a), 1e-30)
            print(f"{i:>3} {ref[i]['step_out']:>14.6e} {a:>18.12f} "
                  f"{b:>18.12f} {rel:>10.3e}")

    seg_tag = "" if args.segment == 0 else f"_seg{args.segment}"
    dest = REPO / "benchmarks" / f"physical_edge_window_{args.lane}{seg_tag}.json"
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

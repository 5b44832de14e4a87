#!/usr/bin/env python
"""Shared-state bisection of the physical-edge g10 step-5 divergence.

benchmarks/physical_edge_window_i50_interface.json shows the repo
bit-tracking the reference (≤4e-10) through g10 steps 0-4 and jumping to
2.8e-6 at step 5 — the first ACCEPTED shape step after four rejected ones.
tools/physical_edge_sensitivity.py proved the reference protocol is
STABLE (1e-10 perturbations grow to only 5e-9 with zero accept flips), so
that jump is a semantics gap, not noise amplification.

This tool isolates it: the REFERENCE runs the g10 window and dumps its
full state (positions, all tilt fields, scalar params) at the entry of
outer iteration N (default 5, captured by counting the per-iteration
_update_scalar_params calls).  Then BOTH solvers restart a fresh
minimize window from that exact state and the per-step accepted energies
are compared.  Equal restarts (≤1e-10) localize the gap to iterations
0..N-1's machinery (the rejected-step/fallback path); unequal restarts
pin it inside iteration N's relax/scan/line-search chain.

    python tools/diag_step5_shared_state.py i50_interface --at 5 --steps 5

Writes benchmarks/step5_shared_state_<lane>.json.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
FIXTURES = REF / "tests" / "fixtures"

_REF_CAPTURE = """
import json, sys
sys.path.insert(0, {ref!r})
from pathlib import Path
import numpy as np
from tools.reproduce_theory_parity import (
    _build_context,
    _stabilize_rim_radius_for_parity,
    _activate_local_outer_shell_for_parity,
)

ctx = _build_context(Path({fixture!r}))
_stabilize_rim_radius_for_parity(ctx.mesh)
ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)

mn = ctx.minimizer
mesh = ctx.mesh
count = [0]
orig = mn._update_scalar_params

class Captured(Exception):
    pass

def counting(*a, **k):
    if count[0] == {at}:
        vids = sorted(mesh.vertices)
        pos = np.array([mesh.vertices[v].position for v in vids], dtype=np.float64)
        tin = np.array([np.asarray(mesh.vertices[v].tilt_in, dtype=np.float64) for v in vids])
        tout = np.array([np.asarray(mesh.vertices[v].tilt_out, dtype=np.float64) for v in vids])
        tilt = np.array([np.asarray(mesh.vertices[v].tilt, dtype=np.float64) for v in vids])
        np.savez({dump!r}, vids=np.asarray(vids), pos=pos, tin=tin, tout=tout, tilt=tilt)
        gp = {{}}
        for key, val in mesh.global_parameters.to_dict().items():
            try:
                json.dumps(val)
                gp[key] = val
            except TypeError:
                pass
        Path({dump_gp!r}).write_text(json.dumps(gp))
        raise Captured()
    count[0] += 1
    return orig(*a, **k)

mn._update_scalar_params = counting
try:
    from commands.executor import execute_command_line
    execute_command_line(ctx, "g10")
except Captured:
    print("CAPTURED_OK")
"""

_REF_REPLAY = """
import json, sys
sys.path.insert(0, {ref!r})
from pathlib import Path
import numpy as np
from tools.reproduce_theory_parity import (
    _build_context,
    _stabilize_rim_radius_for_parity,
    _activate_local_outer_shell_for_parity,
)
from commands.executor import execute_command_line

ctx = _build_context(Path({fixture!r}))
_stabilize_rim_radius_for_parity(ctx.mesh)
ctx.mesh._parity_outer_shell_geometry = _activate_local_outer_shell_for_parity(ctx.mesh)
mesh = ctx.mesh

data = np.load({dump!r})
gp = json.loads(Path({dump_gp!r}).read_text())
for key, val in gp.items():
    mesh.global_parameters.set(key, val)
vids = [int(v) for v in data["vids"]]
for i, vid in enumerate(vids):
    v = mesh.vertices[vid]
    v.position[:] = data["pos"][i]
    v.tilt = data["tilt"][i].tolist()
    v.tilt_in = data["tin"][i].tolist()
    v.tilt_out = data["tout"][i].tolist()
mesh.increment_version()

trace = []
orig_step = ctx.minimizer.stepper.step
def rec(mesh_, grad, step_size_in, energy_fn, **kw):
    ok, new_step, E = orig_step(mesh_, grad, step_size_in, energy_fn, **kw)
    trace.append([bool(ok), float(E)])
    return ok, new_step, E
ctx.minimizer.stepper.step = rec
execute_command_line(ctx, "g{steps}")
print("REPLAY_TRACE " + json.dumps(trace))
"""

_REPO_REPLAY = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
import numpy as np
from tools.reproduce_theory_parity import build_context
from membrane_solver_tpu.commands.executor import execute_command_line
import membrane_solver_tpu.runtime.jit_core as jc
import membrane_solver_tpu.runtime.minimizer as mz

trace = []
_orig_block = jc.minimize_block
def rec_block(spec, options):
    blk = _orig_block(spec, options)
    def call(*a, **k):
        st, ss, stats = blk(*a, **k)
        if int(stats.iterations) > 0:
            trace.append([bool(stats.step_success), float(stats.accepted_energy)])
        return st, ss, stats
    return call
jc.minimize_block = rec_block
mz.jit_core.minimize_block = rec_block

ctx = build_context(Path({fixture!r}))
mesh = ctx.mesh
data = np.load({dump!r})
gp = json.loads(Path({dump_gp!r}).read_text())
for key, val in gp.items():
    mesh.global_parameters.set(key, val)
# keep the repo-side parity replay mode (not a reference key)
mesh.global_parameters.set("rim_slope_match_kkt_rows", "reference_exact")
vids = [int(v) for v in data["vids"]]
for i, vid in enumerate(vids):
    v = mesh.vertices[vid]
    v.position[:] = data["pos"][i]
    v.tilt = data["tilt"][i].tolist()
    v.tilt_in = data["tin"][i].tolist()
    v.tilt_out = data["tout"][i].tolist()
ctx.minimizer.invalidate()
execute_command_line(ctx, "g{steps}")
ctx.sync_mesh()
print("REPLAY_TRACE " + json.dumps(trace))
"""


def _run(code: str, tag: str, timeout: int = 3600):
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=timeout
    )
    for line in out.stdout.splitlines():
        if line.startswith(tag + " "):
            return json.loads(line[len(tag) + 1 :])
        if line.startswith(tag):
            return True
    raise RuntimeError(
        f"subprocess failed (rc {out.returncode}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("lane", nargs="?", default="i50_interface",
                    choices=["i50_interface", "i60_interface", "near_edge_v1"])
    ap.add_argument("--at", type=int, default=5, help="iteration to capture")
    ap.add_argument("--steps", type=int, default=5, help="replay window length")
    args = ap.parse_args(argv)

    fixture = str(
        FIXTURES / f"kozlov_1disk_3d_free_disk_theory_parity_{args.lane}.yaml"
    )
    tmp = tempfile.mkdtemp(prefix="step5_")
    dump = str(Path(tmp) / "state.npz")
    dump_gp = str(Path(tmp) / "gp.json")

    _run(_REF_CAPTURE.format(ref=str(REF), fixture=fixture, at=args.at,
                             dump=dump, dump_gp=dump_gp), "CAPTURED_OK")
    ref_trace = _run(_REF_REPLAY.format(ref=str(REF), fixture=fixture,
                                        dump=dump, dump_gp=dump_gp,
                                        steps=args.steps), "REPLAY_TRACE")
    repo_trace = _run(_REPO_REPLAY.format(repo=str(REPO), fixture=fixture,
                                          dump=dump, dump_gp=dump_gp,
                                          steps=args.steps), "REPLAY_TRACE")

    print(f"{'i':>3} {'ref ok':>7} {'ref E':>18} {'repo ok':>8} {'repo E':>18} {'rel dev':>10}")
    rows = []
    for i in range(min(len(ref_trace), len(repo_trace))):
        (rok, re_), (pok, pe) = ref_trace[i], repo_trace[i]
        rel = abs(re_ - pe) / max(abs(re_), 1e-30)
        rows.append({"i": i, "ref": [rok, re_], "repo": [pok, pe], "rel": rel})
        print(f"{i:>3} {str(rok):>7} {re_:>18.12f} {str(pok):>8} {pe:>18.12f} {rel:>10.3e}")

    dest = REPO / "benchmarks" / f"step5_shared_state_{args.lane}.json"
    dest.write_text(json.dumps(
        {"lane": args.lane, "at": args.at, "steps": args.steps, "rows": rows}, indent=1))
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

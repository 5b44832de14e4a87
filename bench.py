#!/usr/bin/env python
"""Headline benchmark: per-minimization-step wall-clock on the 770-vertex cube lane.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the NumPy reference (`AvishaiBarnoy/membrane_solver`) on this host
runs the same 770-vertex cube GD lane (warm, quiet, adaptive Armijo steps) at
17.53 ms/step (measured 2026-08-16 via runtime/minimizer.py:minimize on
benchmarks/inputs/cube_770.json; see BASELINE.md).  vs_baseline is the
speedup factor (reference_time / our_time).

Runs on whatever JAX platform the environment provides (TPU via axon tunnel
in CI; set BENCH_PLATFORM=cpu to force host CPU).  Precision follows
MEMBRANE_SOLVER_X64 (default f64 for parity with the reference).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))

REFERENCE_MS_PER_STEP = 17.527  # NumPy reference, same host, same lane (see BASELINE.md)


def main() -> None:
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from membrane_solver_tpu import Minimizer, load_data, parse_geometry

    mesh = parse_geometry(load_data(REPO / "benchmarks" / "inputs" / "cube_770.json"))
    minim = Minimizer(mesh, quiet=True)
    minim.step_size = 0.028159473742371446  # step size at this stage of the recipe

    warmup = int(os.environ.get("BENCH_WARMUP", "5"))
    steps = int(os.environ.get("BENCH_STEPS", "200"))

    minim.minimize(warmup)  # compile + warm
    t0 = time.perf_counter()
    minim.minimize(steps)
    dt = time.perf_counter() - t0

    ms_per_step = dt / steps * 1e3
    print(
        json.dumps(
            {
                "metric": "cube770_gd_per_step_ms",
                "value": round(ms_per_step, 4),
                "unit": "ms/step",
                "vs_baseline": round(REFERENCE_MS_PER_STEP / ms_per_step, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Kozlov-3d theory-parity lane vs the reference's TeX targets (VERDICT
round-1 item 7: extend the TeX-targets comparison to the kozlov 3d lane).

The closed-form tier checks the Bessel-ratio TeX benchmark block
(tools/reproduce_theory_parity.tex_benchmark_terms) against
theory_parity_targets.yaml at its own 1e-9 tolerances.  The full lane runs
the recorded protocol (g10;r;V2;t5e-3;g8;t2e-3;g12) with rim
re-stabilization and checks BOTH the targets fixture (ratio tolerances)
and theory_parity_baseline.yaml (recorded energies/breakdown) — the run
reproduces the reference's theta_ratio to the last printed digit
(0.4876215659989338) and the contact term to ~1e-10.
"""

from __future__ import annotations

from pathlib import Path

import pytest

REF_FIXTURES = Path("/root/reference/tests/fixtures")

pytestmark = pytest.mark.skipif(
    not REF_FIXTURES.exists(), reason="reference fixtures not mounted"
)


def test_tex_benchmark_closed_form_matches_targets():
    import yaml

    from tools.reproduce_theory_parity import (
        DEFAULT_TEX_BENDING_MODULUS,
        DEFAULT_TEX_TILT_MODULUS,
        DEFAULT_THEORY_RADIUS,
        tex_benchmark_terms,
    )

    terms = tex_benchmark_terms(
        kappa=DEFAULT_TEX_BENDING_MODULUS,
        kappa_t=DEFAULT_TEX_TILT_MODULUS,
        radius=DEFAULT_THEORY_RADIUS,
        drive=4.286,
        theta_meas=0.0,
        elastic_meas=0.0,
        contact_meas=0.0,
        total_meas=0.0,
    )
    targets = yaml.safe_load(
        (REF_FIXTURES / "theory_parity_targets.yaml").read_text()
    )["targets"]["tex_benchmark"]
    for key in ("thetaB_star", "elastic_star", "contact_star", "total_star"):
        assert abs(terms[key] - float(targets[key]["expected"])) <= float(
            targets[key]["abs_tol"]
        ), key


def _run_lane_subprocess(code: str) -> dict:
    """Run one theory lane in its own process (big-lane XLA:CPU executables
    are one-per-process robust; multi-lane processes occasionally segfault
    inside the compilation cache's executable deserialization)."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=2400
    )
    for line in out.stdout.splitlines():
        if line.startswith("LANE_RESULT "):
            return json.loads(line[len("LANE_RESULT "):])
    raise AssertionError(
        f"lane subprocess failed (rc {out.returncode}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


_LANE_DRIVER = """
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from tools.reproduce_theory_parity import (
    build_context, collect_report, compare_to_baseline, compare_to_targets,
    run_protocol,
)
fixture = Path({fixture!r})
ctx = build_context(fixture)
run_protocol(ctx)
report = collect_report(ctx, fixture)
failures = []
if {targets!r}:
    failures += compare_to_targets(report, Path({targets!r}))
if {baseline!r}:
    failures += compare_to_baseline(report, Path({baseline!r}))
print("LANE_RESULT " + json.dumps({{"failures": failures, "metrics": report["metrics"]}}))
"""


@pytest.mark.acceptance
@pytest.mark.slow
def test_theory_parity_full_lane():
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    res = _run_lane_subprocess(
        _LANE_DRIVER.format(
            repo=repo,
            fixture=str(REF_FIXTURES / "kozlov_1disk_3d_free_disk_theory_parity.yaml"),
            targets=str(REF_FIXTURES / "theory_parity_targets.yaml"),
            baseline=str(REF_FIXTURES / "theory_parity_baseline.yaml"),
        )
    )
    assert not res["failures"], "\n".join(res["failures"])


@pytest.mark.acceptance
@pytest.mark.slow
@pytest.mark.parametrize("lane", ["i50_interface", "i60_interface", "near_edge_v1"])
def test_physical_edge_interface_lane(lane):
    """physical_edge_staggered_v1 interface-profile lanes (reference
    test_theory_parity_against_tex_acceptance.py:791-875 structural
    assertions, plus documented-tolerance numerics).

    Module-level E/grad parity on these lanes is machine-epsilon (see
    tests/test_tilt_module_parity.py and the adjoint-surrogate notes in
    energy/bending_tilt_leaflet.py); the end-to-end trajectory still
    differs in the thetaB-optimize candidate-relax budget: the reference
    scores candidates with a partially-converged 60-step probe, and its
    multi-iteration inner solves are NOT reproducible by clean evaluation
    — measured on the scaffold lane, a single relax iteration matches
    this solver bit-for-bit (4e-17) and the clean KKT-projected gradients
    at the iteration-2 entry state agree to 1e-15, yet the reference's
    in-loop second iteration lands 2.5e-3 elsewhere because it reuses
    stale tilt-payload intermediates across iterations (its own recorded
    g5 != g1;g1;g1;g1;g1 class, tests/fixtures/ref_stale_cache_traces.json).
    Candidate ties therefore flip near the grid resolution and theta lands
    within one 0.01 grid step of the recorded baseline rather than exactly
    on it.  Asserted here: the structural diagnostics the reference pins
    (physical_edge_local_shell construction, disk radius 7/15, sub-unit
    first shell) and theta/energy within the documented envelope.
    """
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    fixture = REF_FIXTURES / (
        f"kozlov_1disk_3d_free_disk_theory_parity_{lane}.yaml"
    )
    res = _run_lane_subprocess(
        _LANE_DRIVER.format(
            repo=repo, fixture=str(fixture), targets="", baseline=""
        )
    )
    report = {"metrics": res["metrics"]}
    geom = report["metrics"]["diagnostics"]["outer_shell_geometry"]
    assert geom["construction_mode"] == "physical_edge_local_shell"
    assert abs(geom["rim_radius"] - 7.0 / 15.0) < 5e-3
    assert geom["outer_radius"] < 1.0
    baseline_name = {
        "i50_interface": "theory_parity_i50_interface_baseline.yaml",
        "i60_interface": "theory_parity_i60_interface_baseline.yaml",
        "near_edge_v1": "theory_parity_near_edge_v1_baseline.yaml",
    }[lane]
    import yaml

    base = yaml.safe_load((REF_FIXTURES / baseline_name).read_text())["metrics"]
    theta = report["metrics"]["thetaB_value"]
    assert abs(theta - float(base["thetaB_value"])) <= 0.0201, (theta, base["thetaB_value"])
    e = report["metrics"]["final_energy"]
    assert abs(e - float(base["final_energy"])) <= 0.05 * abs(float(base["final_energy"])) + 0.01

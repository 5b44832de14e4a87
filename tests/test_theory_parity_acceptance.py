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
    assertions) with EXACT thetaB reproduction.

    theta parity was closed in round 3 by reproducing four reference
    behaviors measured on the i50 lane (each verified bit-exact against a
    reference trace before landing):

    1. Iteration ordering: relax(i) -> theta scan(i) -> shape step(i), no
       re-relax between scan and step (reference minimizer.py:1226-1360;
       our minimizer runs the guarded relax host-side on scan iterations
       and tells the jitted block to skip its first-iteration relax).
    2. Scan probe budget: the scan's tilt_inner_steps=60 override is
       trumped by tilt_cg_max_iters=120 inside the reference relax
       (tilt_relaxation.py:279), so probes run 120 CG iterations.
    3. In-loop objective: the reference relax routes tilt_in/tilt_out
       through the evaluation manager's lumped magnitude fast path
       (evaluation_manager.py:561-575, 658-691), silently bypassing
       tilt_mass_mode_in=consistent and row weights that the clean scorer
       honors (3.05e-4 on the i50 entry state); the relax descends a
       different objective than the score.
    4. The out-leaflet Jacobi preconditioner mass term uses the
       leaflet-present (absent-masked) areas (tilt_relaxation.py:675-697),
       and the parity protocol lifts the rim shell by the physical-edge
       z-bump before the first command and releases it afterwards
       (reference reproduce_theory_parity.py:144-165,269-293) — without
       the bump the outer leaflet never leaves the flat branch.

    With those in place the relax trajectory matches the reference
    bit-for-bit through 120 CG iterations (2.8e-18 max tilt delta) and
    every theta-scan selection agrees on all three lanes.  With the
    reduced-LS baseline semantics in jit_core (energy0 relaxes the BASE
    tilts and the relaxed state seeds every trial, reference
    line_search.py:288), the pre-refine g10 window's accept/reject
    pattern matches the reference step for step
    (tests/test_reduced_ls_window_parity.py).  The post-refine residual
    was then cut 0.8-1.3e-2 -> 1.7-5.2e-3 by two more parity fixes
    (2026-08-19): the shared-target sequential rim_slope_match_out
    enforcement (the refined 24-row disk ring azimuth-matches onto the
    unrefined 12-row trace ring; the parallel update read 0.6x the
    reference's enforced slope) and the padded-scatter drop fix in
    pin_to_plane/pin_to_circle (padding entries un-projected vertex row
    0 after every mesh op).  Final energies now track within 5.2e-3
    (i50 3.5e-3, i60 1.7e-3, near_edge 5.2e-3).

    The remaining residual was root-caused in round 5 and is UNCLOSABLE
    without emulating the reference's cache engine (recorded exemption,
    BASELINE.md): every semantic stage is bit-identical on shared states
    (entry 5.9e-17, gradients 5.5e-16, E0 <=1e-12, enforcement 5e-18,
    trial relax <=5e-18 at every iteration count), the reference is not
    chaotic (1e-10 perturbations -> 4.8e-9, zero flips,
    tools/physical_edge_sensitivity.py), and the source is the
    reference's own relax returning deterministically different results
    (~2e-6/accepted step) for bit-identical logical state depending on
    whether its lazy SoA caches are warm or cold
    (tools/ref_cache_warmth_repro.py, CONFIRMED; clearing the caches
    reproduces this solver's value bit-exactly, 6.9e-18).
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
    assert theta == pytest.approx(float(base["thetaB_value"]), abs=1e-12), (
        theta,
        base["thetaB_value"],
    )
    e = report["metrics"]["final_energy"]
    assert abs(e - float(base["final_energy"])) <= 7.5e-3

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


@pytest.mark.acceptance
@pytest.mark.slow
def test_theory_parity_full_lane():
    from tools.reproduce_theory_parity import (
        build_context,
        collect_report,
        compare_to_baseline,
        compare_to_targets,
        run_protocol,
    )

    fixture = REF_FIXTURES / "kozlov_1disk_3d_free_disk_theory_parity.yaml"
    ctx = build_context(fixture)
    run_protocol(ctx)
    report = collect_report(ctx, fixture)
    failures = compare_to_targets(report, REF_FIXTURES / "theory_parity_targets.yaml")
    failures += compare_to_baseline(
        report, REF_FIXTURES / "theory_parity_baseline.yaml"
    )
    assert not failures, "\n".join(failures)


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
    differs in the thetaB-optimize candidate-relax budget (the reference
    scores candidates with a partially-converged 60-step probe whose
    stopping point depends on its CG internals), so theta lands within one
    0.01 grid step of the recorded baseline rather than exactly on it.
    Asserted here: the structural diagnostics the reference pins
    (physical_edge_local_shell construction, disk radius 7/15, sub-unit
    first shell) and theta/energy within the documented envelope.
    """
    from tools.reproduce_theory_parity import (
        build_context,
        collect_report,
        run_protocol,
    )

    fixture = REF_FIXTURES / (
        f"kozlov_1disk_3d_free_disk_theory_parity_{lane}.yaml"
    )
    ctx = build_context(fixture)
    run_protocol(ctx)
    report = collect_report(ctx, fixture)
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

"""Acceptance lane: Kozlov-Hamm tilt-decay theory parity.

Mirrors the reference's scientific acceptance gate
(tools/reproduce_theory_parity.py vs tests/fixtures/theory_parity_baseline.yaml):
the relaxed 1-disk lane's radial inner-leaflet tilt profile must match the
modified-Bessel decay t(r) = t_B K1(r/lambda)/K1(R/lambda) and the recorded
baseline numbers.  Marked slow: one full protocol run (~2 min on CPU).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent
BASELINE = REPO / "tests" / "fixtures" / "theory_parity_baseline.yaml"

pytestmark = [pytest.mark.acceptance, pytest.mark.slow]


def test_theory_parity_against_baseline():
    sys.path.insert(0, str(REPO / "tools"))
    import reproduce_theory_parity as rtp

    minim = rtp.run_protocol()
    report = rtp.build_report(minim)

    for key, ok in report["pass"].items():
        assert ok, f"theory metric {key} = {report['metrics'][key]} above target"

    assert BASELINE.exists(), "record with tools/reproduce_theory_parity.py --write-baseline"
    base = yaml.safe_load(BASELINE.read_text())
    for key in ("energy", "lambda_fit", "t_boundary"):
        ref, cur = float(base[key]), float(report[key])
        assert abs(cur - ref) <= 1e-6 * max(abs(ref), 1e-12), (
            f"{key} drifted: baseline {ref} vs current {cur}"
        )

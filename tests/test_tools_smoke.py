"""Smoke lanes for the developer tools that previously had no pytest
coverage: tilt_benchmark_runner and profile_macro_hotspots.

Parity: the reference drives these by hand (README.md:137-146); here each
tool's main() runs in-process on a tiny lane and its outputs are asserted.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOLS = REPO / "tools"
if str(TOOLS) not in sys.path:
    sys.path.insert(0, str(TOOLS))


def test_tilt_benchmark_runner_reports_lane(tmp_path, capsys):
    import tilt_benchmark_runner as tbr

    out = tmp_path / "report.json"
    rc = tbr.main(
        ["gen:rect_tilt_source", "--steps", "1", "--json", str(out), "--platform", "cpu"]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "gen:rect_tilt_source" in printed
    report = json.loads(out.read_text())
    lane = report["gen:rect_tilt_source"]
    assert "energy" in lane and "breakdown" in lane
    # the rect tilt-source lane carries a live tilt field with statistics
    tilt_fields = [k for k in ("tilts", "tilts_in", "tilts_out") if k in lane]
    assert tilt_fields
    for f in tilt_fields:
        assert lane[f]["max"] > 0.0


def test_profile_macro_hotspots_times_each_command(capsys):
    import profile_macro_hotspots as pmh

    rc = pmh.main([str(REPO / "meshes/cube.json"), "g2;u", "--platform", "cpu"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "g2" in printed and "u" in printed


def test_profile_macro_hotspots_cprofile_lane(capsys):
    import profile_macro_hotspots as pmh

    rc = pmh.main(
        [str(REPO / "meshes/cube.json"), "g2", "--cprofile", "g2", "--platform", "cpu"]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "cumulative" in printed  # pstats table emitted

"""analysis/multidisk_sweep.py — directory scan, observables, outputs.

Counterpart of the reference's tests/test_multidisk_sweep_analysis.py
(reference analysis at membrane_solver/analysis/multidisk_sweep.py:53-449):
scanning a directory of meshes must produce results.csv/results.json with
one sorted row per mesh, separation parsed from tagged disk-group
centroids (or the filename fallback), and the three figures.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path

import pytest

from membrane_solver_tpu.analysis.multidisk_sweep import analyze_mesh, run_sweep
from membrane_solver_tpu.meshgen import build


@pytest.fixture(scope="module")
def sweep_dir(tmp_path_factory) -> Path:
    d = tmp_path_factory.mktemp("multidisk_runs")
    for L in (2.0, 3.0, 4.5):
        data = build("cube", size=1.0 + 0.1 * L)
        (d / f"run_L{L}.json").write_text(json.dumps(data))
    return d


def test_run_sweep_outputs(sweep_dir, tmp_path):
    out = tmp_path / "out"
    rows = run_sweep(sweep_dir, out, plot=True)
    assert len(rows) == 3
    # sorted by separation (filename fallback: run_L2.0 < run_L3.0 < run_L4.5)
    assert [r["separation"] for r in rows] == [2.0, 3.0, 4.5]
    for r in rows:
        assert r["energy"] > 0.0 and r["area"] > 0.0 and r["volume"] > 0.0
        assert r["min_edge_length"] > 0.0 and r["radius_of_gyration"] > 0.0
        assert any(k.startswith("E_") for k in r)

    assert (out / "results.json").exists()
    recorded = json.loads((out / "results.json").read_text())
    assert [r["file"] for r in recorded] == [r["file"] for r in rows]

    with open(out / "results.csv") as fh:
        csv_rows = list(csv.DictReader(fh))
    assert len(csv_rows) == 3
    assert "energy" in csv_rows[0] and "separation" in csv_rows[0]

    for fig in ("energy_vs_L.png", "interaction_energy_vs_L.png", "observables_vs_L.png"):
        assert (out / fig).exists(), f"missing figure {fig}"


def test_analyze_mesh_centroid_separation(tmp_path):
    """Two tagged rigid-disk groups -> separation = centroid distance."""
    data = build("cube", size=1.0)
    verts = []
    for i, v in enumerate(data["vertices"]):
        opts = {"rigid_disk_group": "a" if v[0] < 0.5 else "b"}
        verts.append(list(v[:3]) + [opts])
    data["vertices"] = verts
    path = tmp_path / "pair.json"
    path.write_text(json.dumps(data))
    row = analyze_mesh(path)
    # group centroids sit at x=0 and x=1 planes of the unit cube
    assert row["separation"] == pytest.approx(1.0, abs=1e-12)


def test_skips_unreadable_files(sweep_dir, tmp_path):
    bad = tmp_path / "mix"
    bad.mkdir()
    (bad / "run_L1.0.json").write_text(json.dumps(build("cube")))
    (bad / "broken_L9.json").write_text("{not json")
    rows = run_sweep(bad, tmp_path / "o", plot=False)
    assert [r["file"] for r in rows] == ["run_L1.0.json"]

"""The meshgen command-line entry (`python -m membrane_solver_tpu.meshgen`).

Reference counterpart: the reference ships its benchmark meshes as a static
zoo under /root/reference/meshes/ and benchmarks/inputs/; this repo generates
them (membrane_solver_tpu/meshgen), so the generator's CLI is part of the
operator surface (docs/MANUAL.md §meshgen) and is tested in-process here.
"""

from __future__ import annotations

import json

import pytest

from membrane_solver_tpu import parse_geometry
from membrane_solver_tpu.geometry.io_readers import load_data
from membrane_solver_tpu.meshgen import BUILDERS
from membrane_solver_tpu.meshgen.__main__ import main


def test_list_prints_every_builder(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out.split()
    assert out == sorted(BUILDERS)


def test_no_name_defaults_to_list(capsys):
    assert main([]) == 0
    assert capsys.readouterr().out.split() == sorted(BUILDERS)


def test_writes_parseable_mesh(tmp_path, capsys):
    out = tmp_path / "lane.json"
    assert main(["cube", "-o", str(out)]) == 0
    mesh = parse_geometry(load_data(str(out)))
    assert len(mesh.vertices) >= 8
    assert "Wrote" in capsys.readouterr().err


def test_stdout_mode_emits_json(capsys):
    assert main(["cube"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert "vertices" in data


def test_set_overrides_builder_kwargs(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    assert main(["catenoid", "-o", str(a)]) == 0
    assert main(["catenoid", "--set", "n_theta=8", "-o", str(b)]) == 0
    na = len(json.load(open(a))["vertices"])
    nb = len(json.load(open(b))["vertices"])
    assert nb != na  # the kwarg actually reached the builder


def test_set_parses_json_and_raw_values():
    from membrane_solver_tpu.meshgen.__main__ import _parse_kv

    kv = _parse_kv(["n=8", "flag=true", "name=plain-string", "x=1.5"])
    assert kv == {"n": 8, "flag": True, "name": "plain-string", "x": 1.5}


def test_unknown_builder_raises():
    with pytest.raises(KeyError):
        main(["definitely_not_a_builder"])

"""Command-layer lanes for save / properties / snapshot.

Parity: reference commands/io.py (SaveCommand, PropertiesCommand) and
commands/mesh_ops.py SnapshotCommand ("fix" alias) — snapshot freezes
per-entity targets at their current values with an optional
`where key=value` filter.
"""

from __future__ import annotations

import numpy as np
import pytest

from membrane_solver_tpu import Minimizer, load_data, parse_geometry
from membrane_solver_tpu.commands.context import CommandContext
from membrane_solver_tpu.commands.executor import execute_command_line


@pytest.fixture
def ctx():
    mesh = parse_geometry(load_data("meshes/cube.json"))
    mesh.instructions = []
    mn = Minimizer(mesh, quiet=True)
    return CommandContext(mesh=mesh, minimizer=mn, stepper=mn.stepper)


def test_save_command_roundtrips(ctx, tmp_path):
    out = tmp_path / "saved.json"
    execute_command_line(ctx, f"save {out}")
    assert out.exists()
    back = parse_geometry(load_data(out))
    assert sorted(back.vertices) == sorted(ctx.mesh.vertices)
    for vid in back.vertices:
        assert np.allclose(
            back.vertices[vid].position, ctx.mesh.vertices[vid].position
        )


def test_properties_command_prints_area_volume_rg(ctx, capsys):
    execute_command_line(ctx, "properties")
    out = capsys.readouterr().out
    assert "Total surface area: 6.0" in out
    assert "volume=1.0" in out
    assert "Radius of gyration" in out


def test_snapshot_freezes_targets_with_filter(ctx):
    for i, facet in enumerate(ctx.mesh.facets.values()):
        facet.options["zone"] = "a" if i % 2 == 0 else "b"
    execute_command_line(ctx, "snapshot facets where zone=a")
    tagged = [f for f in ctx.mesh.facets.values() if f.options.get("zone") == "a"]
    untagged = [f for f in ctx.mesh.facets.values() if f.options.get("zone") == "b"]
    assert tagged and untagged
    for f in tagged:
        assert abs(f.options["target_area"] - ctx.mesh.facet_area(f)) < 1e-12
    for f in untagged:
        assert "target_area" not in f.options


def test_snapshot_edges_records_lengths(ctx):
    execute_command_line(ctx, "snapshot edges")
    for e in ctx.mesh.edges.values():
        p1 = ctx.mesh.vertices[e.tail_index].position
        p2 = ctx.mesh.vertices[e.head_index].position
        assert abs(e.options["target_length"] - float(np.linalg.norm(p2 - p1))) < 1e-12

"""Visualization smoke + artist-count tests.

Parity: the reference tests its plot_core/cli paths (reference tests/
test_visualization*.py); these render every color mode and overlay to an
Agg canvas and assert the produced matplotlib artists — collection
counts, segment counts, colorbars, text labels — not just "no exception".
"""

from __future__ import annotations

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import (  # noqa: E402
    Line3DCollection,
    Path3DCollection,
    Poly3DCollection,
)

from membrane_solver_tpu import parse_geometry  # noqa: E402
from membrane_solver_tpu.meshgen import build  # noqa: E402
from membrane_solver_tpu.visualization import plot_geometry, update_live_vis  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


@pytest.fixture(scope="module")
def tilted_mesh():
    """kozlov disk mesh with a coherent +x inner-leaflet tilt field and two
    facet patch labels — enough structure for every overlay to draw."""
    mesh = parse_geometry(build("kozlov_1disk"))
    nv = len(mesh.vertices)
    pos = mesh.positions_array()
    # +x-directed field whose MAGNITUDE varies with radius (a constant
    # magnitude would legitimately render a single uniform facet color)
    radial = np.linalg.norm(pos[:, :2], axis=1)
    mags = 0.2 + 0.8 * radial / max(radial.max(), 1e-12)
    tilts = np.stack([mags, 0.05 * mags, np.zeros(nv)], axis=1)
    mesh.set_tilts_array(tilts, which="tilt_in")
    mesh.project_tilts_to_tangent()
    for fid in sorted(mesh.facets):
        centroid = np.mean(
            [mesh.vertices[v].position for v in mesh.facet_vertex_loop(mesh.facets[fid])],
            axis=0,
        )
        mesh.facets[fid].options["disk_patch"] = (
            "disk_a" if centroid[0] >= 0.0 else "ambient"
        )
    return mesh


def _collections_of(ax, cls):
    return [c for c in ax.collections if isinstance(c, cls)]


def _segments3d(lc):
    """Line3DCollection stores its 3D segments in _segments3d after
    add_collection3d; get_segments() holds only the 2D projection buffer."""
    return np.asarray(lc._segments3d)


def test_plain_render_has_facet_collection(tilted_mesh):
    ax = plot_geometry(tilted_mesh)
    polys = _collections_of(ax, Poly3DCollection)
    assert len(polys) == 1
    assert len(ax.figure.axes) == 1  # no colorbar without a color mode


@pytest.mark.parametrize(
    "mode", ["tilt", "tilt_in", "tilt_out", "tilt_bilayer", "div", "div_in", "div_out"]
)
def test_color_modes_render_and_add_colorbar(tilted_mesh, mode):
    ax = plot_geometry(tilted_mesh, color_by=mode)
    polys = _collections_of(ax, Poly3DCollection)
    assert len(polys) == 1
    colors = np.asarray(polys[0].get_facecolor())
    assert np.all(np.isfinite(colors))
    assert len(ax.figure.axes) == 2, "color mode must attach a colorbar"
    if mode in {"tilt", "tilt_in", "tilt_bilayer", "div_in", "div"}:
        # the seeded inner field is non-uniform after tangent projection
        assert len(np.unique(colors, axis=0)) > 1


def test_tilt_out_mode_uniform_when_field_zero(tilted_mesh):
    ax = plot_geometry(tilted_mesh, color_by="tilt_out", show_colorbar=False)
    assert len(ax.figure.axes) == 1  # colorbar suppressed on request


def test_tilt_arrows_segment_count(tilted_mesh):
    nv = len(tilted_mesh.vertices)
    ax = plot_geometry(tilted_mesh, show_tilt_arrows=True, tilt_arrows_max=None)
    lines = _collections_of(ax, Line3DCollection)
    assert lines, "arrow overlay missing"
    n_segs = sum(len(_segments3d(lc)) for lc in lines)
    # only tilt_in is nonzero -> one arrow per vertex with |t|>1e-12
    mags = np.linalg.norm(tilted_mesh.tilts_in_array(), axis=1)
    assert n_segs == int((mags > 1e-12).sum())
    assert 0 < n_segs <= nv


def test_tilt_arrows_cap(tilted_mesh):
    ax = plot_geometry(tilted_mesh, show_tilt_arrows=True, tilt_arrows_max=10)
    n_segs = sum(len(_segments3d(lc)) for lc in _collections_of(ax, Line3DCollection))
    assert n_segs == 10


def test_streamlines_follow_coherent_field(tilted_mesh):
    ax = plot_geometry(
        tilted_mesh, show_tilt_streamlines=True, tilt_streamlines_max=40
    )
    lines = _collections_of(ax, Line3DCollection)
    assert lines, "streamline overlay missing"
    segs = np.concatenate([_segments3d(lc) for lc in lines])
    assert len(segs) >= 10
    # a mostly-+x field must produce mostly-+x hops
    deltas = segs[:, 1, :] - segs[:, 0, :]
    assert np.mean(deltas[:, 0] != 0.0) > 0.5


def test_patch_boundary_overlay(tilted_mesh):
    base = plot_geometry(tilted_mesh)
    n_base = len(_collections_of(base, Line3DCollection))
    ax = plot_geometry(tilted_mesh, show_patch_boundaries=True)
    lines = _collections_of(ax, Line3DCollection)
    # one collection per patch label (disk_a + ambient)
    assert len(lines) == n_base + 2
    assert all(len(_segments3d(lc)) > 0 for lc in lines[n_base:])


def test_vertices_and_indices_overlays(tilted_mesh):
    nv = len(tilted_mesh.vertices)
    ax = plot_geometry(tilted_mesh, show_vertices=True, show_indices=True)
    scatters = _collections_of(ax, Path3DCollection)
    assert scatters and scatters[0].get_offsets().shape[0] == nv
    assert len(ax.texts) == nv


def test_boundary_loops_overlay(tilted_mesh):
    ax = plot_geometry(tilted_mesh, show_boundary_loops=True)
    # the kozlov patch is an open disk: at least its outer rim loop
    assert len(ax.lines) >= 1
    assert any("κg" in t.get_text() for t in ax.texts)


def test_edges_only_render(tilted_mesh):
    ax = plot_geometry(tilted_mesh, show_facets=False, show_edges=True)
    assert not _collections_of(ax, Poly3DCollection)
    lines = _collections_of(ax, Line3DCollection)
    assert sum(len(_segments3d(lc)) for lc in lines) == len(tilted_mesh.edges)


def test_save_path_writes_png(tilted_mesh, tmp_path):
    out = tmp_path / "mesh.png"
    plot_geometry(tilted_mesh, color_by="tilt_in", save_path=str(out))
    assert out.exists() and out.stat().st_size > 10_000
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_live_vis_reuses_figure(tilted_mesh):
    state = update_live_vis(tilted_mesh, title="step 0")
    fig_first = state["fig"]
    state = update_live_vis(tilted_mesh, state=state, title="step 1", color_by="tilt_in")
    assert state["fig"] is fig_first
    assert state["ax"].get_title() == "step 1"


def test_viz_cli_end_to_end(tmp_path, monkeypatch):
    """The python -m membrane_solver_tpu.visualization surface (in-process:
    matplotlib state is process-global and Agg is already forced here)."""
    from membrane_solver_tpu.visualization.cli import main

    out = tmp_path / "cli.png"
    rc = main(
        [
            "gen:kozlov_1disk",
            "--tilt",
            "--tilt-streamlines",
            "--patch-boundaries",
            "--no-axes",
            "--save",
            str(out),
            "--platform",
            "cpu",
        ]
    )
    assert rc == 0
    assert out.exists() and out.stat().st_size > 10_000

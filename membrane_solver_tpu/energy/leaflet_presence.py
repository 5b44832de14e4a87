"""Leaflet-absence masking helpers (protein-covered patches etc.).

Parity: reference ``modules/energy/leaflet_presence.py`` — vertices whose
``options.preset`` is listed in ``leaflet_{in,out}_absent_presets`` are
"absent" for that leaflet; triangles touching an absent vertex are excluded
from that leaflet's energies (``leaflet_present_triangle_mask``).  The
compile hook below bakes the per-leaflet vertex and triangle masks into the
topology extras; leaflet energy modules consult them via
:func:`present_triangles`.
"""

from __future__ import annotations

import numpy as np


def _normalize_preset_list(raw):
    if raw is None:
        return []
    if isinstance(raw, str):
        val = raw.strip()
        return [val] if val else []
    if isinstance(raw, (list, tuple, set)):
        return [str(x).strip() for x in raw if x is not None and str(x).strip()]
    return []


def absent_vertex_rows(layout, leaflet: str) -> np.ndarray:
    """Boolean absent mask over layout vertex rows for one leaflet."""
    mesh = layout.mesh
    gp = mesh.global_parameters
    n = len(layout.vertex_ids)
    mask = np.zeros(n, dtype=bool)
    presets = set(_normalize_preset_list(gp.get(f"leaflet_{leaflet}_absent_presets")))
    if not presets:
        return mask
    for vid, vertex in mesh.vertices.items():
        opts = vertex.options or {}
        if opts.get("preset") in presets:
            mask[layout.row_of[int(vid)]] = True
    return mask


def _restore_physical_edge_shell_rows(layout, vmask, leaflet: str) -> None:
    """Keep physical-edge shell rows present for the outer leaflet.

    Parity: reference leaflet_presence._restore_physical_edge_outer_trace_
    rows (125-155) — in physical_edge_staggered_v1 mode the disk-boundary
    ring and the first two free shells stay PRESENT for the out leaflet even
    when their preset is in the absent list, so the outer-leaflet
    continuation across the physical edge carries energy.
    """
    gp = layout.mesh.global_parameters
    if leaflet != "out":
        return
    presets = set(_normalize_preset_list(gp.get("leaflet_out_absent_presets")))
    if "disk" not in presets:
        return
    if str(gp.get("rim_slope_match_mode") or "").strip().lower() != (
        "physical_edge_staggered_v1"
    ):
        return
    mode = str(gp.get("leaflet_out_absence_mode") or "").strip().lower()
    if mode not in {"triangles", "triangle", "facets", "facet"}:
        return
    from membrane_solver_tpu.constraints.local_interface_shells import (
        build_shell_rows,
    )

    shells = build_shell_rows(layout, group="disk")
    if shells is None:
        return
    for rows in (shells.disk_rows, shells.rim_rows, shells.outer_rows):
        vmask[np.asarray(rows, dtype=int)] = False


def compile_topology(layout) -> dict:
    """Per-leaflet absent vertex + present triangle masks (padded)."""
    gp = layout.mesh.global_parameters
    out = {}
    tri, _fids = layout.mesh.triangle_rows()  # (F, 3) vertex rows (unpadded)
    tri = np.asarray(tri, dtype=int)
    for leaflet in ("in", "out"):
        if gp.get(f"leaflet_{leaflet}_absent_presets") is None:
            continue
        vmask = absent_vertex_rows(layout, leaflet)
        _restore_physical_edge_shell_rows(layout, vmask, leaflet)
        vpad = layout.pad_rows(vmask, layout.nv_cap, False)
        tri_present = ~np.any(vmask[tri], axis=1) if len(tri) else np.zeros(0, bool)
        out[f"absent_{leaflet}"] = vpad
        out[f"tri_present_{leaflet}"] = layout.pad_rows(
            tri_present, layout.nf_cap, False
        )
    return out


def present_triangles(topo, leaflet: str):
    """(F,) bool present-triangle mask for the leaflet, or None if unmasked."""
    key = f"energy:leaflet_presence/tri_present_{leaflet}"
    return topo.extras.get(key)

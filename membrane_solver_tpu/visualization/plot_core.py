"""Matplotlib 3D mesh plotting.

Parity: reference ``visualization/plot_core.py`` — facet polygons, edges,
vertex scatter/indices, tilt-magnitude and divergence facet coloring, tilt
arrows, equal-aspect axes.  Headless-safe (Agg) when no display exists.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _ensure_backend():
    import matplotlib

    if not os.environ.get("DISPLAY") and os.name != "nt":
        matplotlib.use("Agg", force=False)


def plot_geometry(
    mesh,
    *,
    color_by: Optional[str] = None,  # None | "tilt" | "divergence"
    show_tilt_arrows: bool = False,
    show_edges: bool = True,
    show_vertices: bool = False,
    show_indices: bool = False,
    show_boundary_loops: bool = False,
    alpha: float = 0.6,
    title: Optional[str] = None,
    ax=None,
    show: bool = False,
    save_path: Optional[str] = None,
):
    """Render the mesh; returns the matplotlib Axes."""
    _ensure_backend()
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    if ax is None:
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(111, projection="3d")
    else:
        fig = ax.figure

    polys = []
    face_values = []
    tilt_mags = {
        vid: float(np.linalg.norm(v.tilt) or np.linalg.norm(v.tilt_in) or 0.0)
        for vid, v in mesh.vertices.items()
    }
    div_by_fid = {}
    if color_by == "divergence":
        # per-triangle P1 divergence of the dominant tilt field
        # (reference plot_core facet coloring "div" mode)
        from membrane_solver_tpu.device.tilt_ops import p1_triangle_divergence

        rows, tri_fids = mesh.triangle_rows()
        if len(tri_fids):
            import jax.numpy as jnp

            pos = jnp.asarray(mesh.positions_array())
            fields = [mesh.tilts_array(), mesh.tilts_in_array(), mesh.tilts_out_array()]
            tilts = max(fields, key=lambda t: float(np.abs(t).max()))
            div, _area, _g = p1_triangle_divergence(
                pos, jnp.asarray(np.asarray(tilts)), jnp.asarray(np.asarray(rows)),
                jnp.ones(len(tri_fids), bool),
            )
            div_by_fid = {int(f): float(d) for f, d in zip(tri_fids, np.asarray(div))}
    for fid in sorted(mesh.facets):
        facet = mesh.facets[fid]
        loop = mesh.facet_vertex_loop(facet)
        pts = np.array([mesh.vertices[v].position for v in loop])
        polys.append(pts)
        if color_by == "tilt":
            face_values.append(np.mean([tilt_mags[v] for v in loop]))
        elif color_by == "divergence":
            face_values.append(abs(div_by_fid.get(fid, 0.0)))
        else:
            face_values.append(0.0)

    if polys:
        collection = Poly3DCollection(polys, alpha=alpha)
        if color_by:
            vals = np.asarray(face_values)
            vmax = vals.max() if vals.max() > 0 else 1.0
            colors = plt.cm.viridis(vals / vmax)
            collection.set_facecolor(colors)
        else:
            collection.set_facecolor("lightsteelblue")
        if show_edges:
            collection.set_edgecolor("k")
            collection.set_linewidth(0.3)
        ax.add_collection3d(collection)

    pts = mesh.positions_array()
    if show_vertices and len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=8, c="crimson")
    if show_indices:
        for vid, v in mesh.vertices.items():
            ax.text(*v.position, str(vid), fontsize=7)

    if show_tilt_arrows:
        for v in mesh.vertices.values():
            for field, color in ((v.tilt, "red"), (v.tilt_in, "blue"), (v.tilt_out, "green")):
                if np.linalg.norm(field) > 1e-12:
                    ax.quiver(*v.position, *field, color=color, length=0.2, normalize=True)

    if show_boundary_loops:
        # open-surface boundary loops with geodesic-turning annotation
        # (reference plot_core boundary-loop overlay)
        from membrane_solver_tpu.runtime.diagnostics.gauss_bonnet import (
            boundary_geodesic_sum,
            extract_boundary_loops,
            find_boundary_edges,
        )

        loops = extract_boundary_loops(mesh, find_boundary_edges(mesh))
        geos = boundary_geodesic_sum(mesh, loops)
        for li, loop in enumerate(loops):
            lp = np.array([mesh.vertices[v].position for v in loop + loop[:1]])
            ax.plot(lp[:, 0], lp[:, 1], lp[:, 2], color="darkorange", lw=1.6)
            g = geos.get(li, geos.get(loop[0], 0.0)) if isinstance(geos, dict) else 0.0
            ax.text(*lp[0], f"∮κg={g:.3f}", fontsize=7, color="darkorange")

    if len(pts):
        # equal aspect
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        center = 0.5 * (lo + hi)
        radius = 0.5 * float((hi - lo).max() or 1.0)
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[1] - radius, center[1] + radius)
        ax.set_zlim(center[2] - radius, center[2] + radius)

    if title:
        ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=150)
    if show:
        import matplotlib.pyplot as plt

        plt.show()
    return ax

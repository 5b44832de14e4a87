"""Host-side topology hazard checks.

Parity: reference ``runtime/topology.py`` — ``detect_vertex_edge_collisions``
(topology.py:84-199) finds vertices dangerously close to non-incident edges
(candidates for refine/pop handling); the in-jit normal-flip and min-edge
guards live in device/geo (check_normal_rotation, min_edge_length).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def detect_vertex_edge_collisions(mesh, threshold: float = 1e-3) -> List[Tuple[int, int]]:
    """(vertex_id, edge_id) pairs with point-to-segment distance < threshold.

    Vectorized O(V*E) numpy (the reference's loop is the same complexity);
    a vertex never collides with an edge it belongs to.
    """
    ids = mesh.vertex_ids
    pos = mesh.positions_array()
    row_of = mesh.vertex_index_to_row
    edge_ids, tails, heads = [], [], []
    for eid, edge in mesh.edges.items():
        if edge.tail_index in row_of and edge.head_index in row_of:
            edge_ids.append(int(eid))
            tails.append(row_of[edge.tail_index])
            heads.append(row_of[edge.head_index])
    if not edge_ids:
        return []
    t = np.asarray(tails)
    h = np.asarray(heads)
    a = pos[t]  # (E, 3)
    d = pos[h] - a
    dd = np.einsum("ij,ij->i", d, d)
    dd = np.where(dd < 1e-30, 1.0, dd)

    # point-to-segment distances, all pairs (V, E)
    rel = pos[:, None, :] - a[None, :, :]
    s = np.clip(np.einsum("vej,ej->ve", rel, d) / dd[None, :], 0.0, 1.0)
    closest = a[None, :, :] + s[:, :, None] * d[None, :, :]
    dist = np.linalg.norm(pos[:, None, :] - closest, axis=2)

    # mask out incident pairs
    v_rows = np.arange(pos.shape[0])
    incident = (v_rows[:, None] == t[None, :]) | (v_rows[:, None] == h[None, :])
    dist = np.where(incident, np.inf, dist)

    v_idx, e_idx = np.nonzero(dist < threshold)
    return [(int(ids[v]), int(edge_ids[e])) for v, e in zip(v_idx, e_idx)]

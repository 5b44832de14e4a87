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
    b = pos[h]

    # x-interval prefilter: a vertex within `threshold` of a segment lies
    # inside the segment's x-range grown by threshold.  Sorting vertices by
    # x turns the candidate set per edge into a contiguous slice, shrinking
    # the exact O(V*E) distance test to the few real candidates.
    order = np.argsort(pos[:, 0], kind="stable")
    xs = pos[order, 0]
    lo = np.searchsorted(xs, np.minimum(a[:, 0], b[:, 0]) - threshold, side="left")
    hi = np.searchsorted(xs, np.maximum(a[:, 0], b[:, 0]) + threshold, side="right")
    counts = hi - lo
    if int(counts.sum()) == 0:
        return []
    e_idx = np.repeat(np.arange(len(edge_ids)), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    v_sorted_idx = np.arange(int(counts.sum())) - np.repeat(starts, counts) + np.repeat(lo, counts)
    v_idx = order[v_sorted_idx]

    pa = pos[v_idx] - a[e_idx]
    d = b[e_idx] - a[e_idx]
    dd = np.einsum("ij,ij->i", d, d)
    dd = np.where(dd < 1e-30, 1.0, dd)
    s = np.clip(np.einsum("ij,ij->i", pa, d) / dd, 0.0, 1.0)
    closest = a[e_idx] + s[:, None] * d
    dist = np.linalg.norm(pos[v_idx] - closest, axis=1)
    incident = (v_idx == t[e_idx]) | (v_idx == h[e_idx])
    keep = (dist < threshold) & ~incident
    return [
        (int(ids[v]), int(edge_ids[e]))
        for v, e in zip(v_idx[keep], e_idx[keep])
    ]

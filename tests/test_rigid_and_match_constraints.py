"""Behavioral checks for rigid_disk and the rim tilt-matching constraints."""

from __future__ import annotations

import numpy as np
import pytest


def _flat_disk_mesh(n_ring=8, radius=1.0, with_tags=None):
    """Small fan disk: center vertex + ring, triangulated."""
    from membrane_solver_tpu.geometry.entities import Body, Edge, Facet, Vertex
    from membrane_solver_tpu.geometry.mesh import Mesh

    mesh = Mesh()
    mesh.vertices[1] = Vertex(1, np.array([0.0, 0.0, 0.0]))
    for i in range(n_ring):
        ang = 2 * np.pi * i / n_ring
        mesh.vertices[2 + i] = Vertex(
            2 + i, np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0])
        )
    eid = 1
    spokes = {}
    ring = {}
    for i in range(n_ring):
        spokes[i] = eid
        mesh.edges[eid] = Edge(eid, 1, 2 + i)
        eid += 1
    for i in range(n_ring):
        ring[i] = eid
        mesh.edges[eid] = Edge(eid, 2 + i, 2 + (i + 1) % n_ring)
        eid += 1
    for i in range(n_ring):
        fid = 1 + i
        mesh.facets[fid] = Facet(
            fid, [spokes[i], ring[i], -spokes[(i + 1) % n_ring]]
        )
    if with_tags:
        for vid, opts in with_tags.items():
            mesh.vertices[vid].options.update(opts)
    return mesh


def test_rigid_disk_enforce_restores_shape():
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    tags = {vid: {"rigid_disk_group": "d"} for vid in range(1, 10)}
    mesh = _flat_disk_mesh(with_tags=tags)
    mesh.global_parameters.update({"rigid_disk_group": "d"})
    mesh.constraint_modules.append("rigid_disk")
    mesh.energy_modules.append("surface")
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()

    # perturb non-rigidly, then enforce: distances to the centroid must
    # return to the reference values (a rigid transform of the original)
    rng = np.random.default_rng(3)
    pert = np.asarray(p.state.positions).copy()
    pert[: p.n_vertices] += 0.05 * rng.standard_normal((p.n_vertices, 3))
    import jax.numpy as jnp
    import dataclasses

    p.state = dataclasses.replace(p.state, positions=jnp.asarray(pert))
    from membrane_solver_tpu.runtime import jit_core

    enforce = jit_core.make_constraint_enforcer(p.spec)
    p.state = enforce(p.state, p.topo, p.params, context="mesh_operation")
    out = np.asarray(p.state.positions)[: p.n_vertices]
    d_center = np.linalg.norm(out[1:] - out[0], axis=1)
    assert np.abs(d_center - 1.0).max() < 1e-9  # ring radius restored rigidly
    ring = out[1:]
    chord = np.linalg.norm(ring - np.roll(ring, -1, axis=0), axis=1)
    assert np.abs(chord - chord[0]).max() < 1e-9


def test_tilt_leaflet_match_rim_enforce():
    from membrane_solver_tpu.runtime import tilt_relax as _tr
    from membrane_solver_tpu.runtime.minimizer import Minimizer

    tags = {vid: {"tilt_leaflet_match_group": "rim"} for vid in range(2, 10)}
    mesh = _flat_disk_mesh(with_tags=tags)
    mesh.global_parameters.update(
        {"tilt_leaflet_match_group": "rim", "tilt_modulus_in": 1.0}
    )
    mesh.constraint_modules.append("tilt_leaflet_match_rim")
    mesh.energy_modules.append("tilt_in")
    rng = np.random.default_rng(0)
    for vid in range(2, 10):
        mesh.vertices[vid].tilt_in = 0.1 * rng.standard_normal(3)
        mesh.vertices[vid].tilt_out = 0.1 * rng.standard_normal(3)
    mn = Minimizer(mesh, quiet=True)
    p = mn.problem()
    enforce = _tr.make_tilt_enforcer(p.spec)
    st = enforce(p.state, p.topo, p.params)
    tin = np.asarray(st.tilts_in)[: p.n_vertices]
    tout = np.asarray(st.tilts_out)[: p.n_vertices]
    # in-plane (x, y) components must now match on the tagged ring
    assert np.abs(tin[1:, :2] - tout[1:, :2]).max() < 1e-12

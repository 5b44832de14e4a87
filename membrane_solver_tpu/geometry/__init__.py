from membrane_solver_tpu.geometry.entities import Body, Edge, Facet, Vertex
from membrane_solver_tpu.geometry.mesh import Mesh, orient_edges_cycle

__all__ = ["Mesh", "Vertex", "Edge", "Facet", "Body", "orient_edges_cycle"]

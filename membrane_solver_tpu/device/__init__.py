from membrane_solver_tpu.device.state import (
    CompiledProblem,
    MeshState,
    ProblemSpec,
    Topology,
    compile_state,
    writeback,
)

__all__ = [
    "MeshState",
    "Topology",
    "ProblemSpec",
    "CompiledProblem",
    "compile_state",
    "writeback",
]

from membrane_solver_tpu.parallel.sweep import (
    SweepBatch,
    batch_problem,
    make_sweep_minimize,
    sweep_sharding,
)

__all__ = ["SweepBatch", "batch_problem", "make_sweep_minimize", "sweep_sharding"]

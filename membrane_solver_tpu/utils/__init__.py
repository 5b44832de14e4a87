from membrane_solver_tpu.utils.precision import default_float

__all__ = ["default_float"]

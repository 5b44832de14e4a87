from membrane_solver_tpu.runtime.minimizer import Minimizer
from membrane_solver_tpu.runtime.steppers import (
    BFGS,
    BaseStepper,
    ConjugateGradient,
    GradientDescent,
    make_stepper,
)

__all__ = [
    "Minimizer",
    "BaseStepper",
    "GradientDescent",
    "ConjugateGradient",
    "BFGS",
    "make_stepper",
]

from .base import SolveOptions, SolveResult, power_lipschitz, solve
from .eq_constrained import solve_equality_constrained
from . import apgd, frank_wolfe, lbfgs, mirror_descent, pgd

__all__ = [
    "SolveOptions",
    "SolveResult",
    "power_lipschitz",
    "solve",
    "solve_equality_constrained",
    "frank_wolfe",
    "lbfgs",
    "mirror_descent",
    "pgd",
]

"""bsls_tpu — TPU-native block-simplex-constrained least squares.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``megacell/block-simplex-least-squares`` reference: projected gradient,
accelerated PGD, projected L-BFGS, entropic mirror descent, and Frank-Wolfe
(+pairwise) solvers over products of simplices, with fused per-block
projection / PAVA kernels and multi-host mesh sharding.
See SURVEY.md for the blueprint and provenance notes.
"""
from .models import (
    BlockPartition,
    DenseMatrix,
    EllMatrix,
    OracleResult,
    Problem,
    oracle_solve,
    oracle_solve_eq,
    synthetic,
)
from .solvers import SolveResult, solve, solve_equality_constrained
from .parallel import make_mesh
from .serving import Endpoint

__version__ = "0.1.0"

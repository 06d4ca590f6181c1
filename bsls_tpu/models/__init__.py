from .partition import BlockPartition, Bucket
from .problem import DenseMatrix, EllMatrix, Problem
from .oracle import OracleResult, fw_gap_np, oracle_solve, oracle_solve_eq
from . import synthetic, traffic

__all__ = [
    "BlockPartition",
    "Bucket",
    "DenseMatrix",
    "EllMatrix",
    "Problem",
    "OracleResult",
    "fw_gap_np",
    "oracle_solve",
    "oracle_solve_eq",
    "synthetic",
]
from .reorder import estimate_bandability, reorder_rows_rcm  # noqa: E402,F401

from .mesh import BLOCK_AXIS, SCENARIO_AXIS, init_distributed, make_mesh
from .sharding import shard_problem, shard_problem_rows, solve_sharded

__all__ = [
    "BLOCK_AXIS",
    "SCENARIO_AXIS",
    "init_distributed",
    "make_mesh",
    "shard_problem",
    "shard_problem_rows",
    "solve_sharded",
]

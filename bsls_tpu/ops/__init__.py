from . import isotonic, layout, projection, quadratic, simplex, ztransform
from .isotonic import pava_blocks, pava_padded
from .layout import (
    DeviceBucket,
    DeviceDense,
    DeviceEll,
    DeviceProblem,
    feasible_init,
    flat_to_padded,
    matvec,
    padded_to_flat,
    prepare,
    rmatvec,
    tree_vdot,
)
from .projection import proj_blocks, proj_simplex_padded
from .simplex import block_min, eg_update, fw_vertex

__all__ = [
    "isotonic",
    "layout",
    "projection",
    "quadratic",
    "simplex",
    "ztransform",
    "pava_blocks",
    "pava_padded",
    "DeviceBucket",
    "DeviceDense",
    "DeviceEll",
    "DeviceProblem",
    "feasible_init",
    "flat_to_padded",
    "matvec",
    "padded_to_flat",
    "prepare",
    "rmatvec",
    "tree_vdot",
    "proj_blocks",
    "proj_simplex_padded",
    "block_min",
    "eg_update",
    "fw_vertex",
]

"""Device-side problem layout: padded<->flat conversions and matrix structs.

Everything here is jit-compatible: static structure (widths, counts,
contiguity flags) lives in pytree metadata; all data is jnp arrays.

The per-iteration data path is

    xp (padded buckets) --scatter--> x_flat --A--> r --A^T--> g_flat
      --gather--> gp (padded)  --> per-block kernel --> xp'

with the scatter/gather collapsing to reshapes for trivially-contiguous
buckets (uniform block size, no dummy rows), which is the layout the large
benchmark configs use.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.partition import BlockPartition
from ..models.problem import DenseMatrix, EllMatrix, Problem

__all__ = [
    "DeviceDense",
    "DeviceEll",
    "DeviceBucket",
    "DeviceProblem",
    "prepare",
    "flat_to_padded",
    "padded_to_flat",
    "matvec",
    "rmatvec",
    "tree_vdot",
    "feasible_init",
]


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


@dataclass(frozen=True)
class DeviceDense:
    data: jnp.ndarray  # (m, n)


_register(DeviceDense, ["data"], [])


@dataclass(frozen=True)
class DeviceEll:
    """Column-oriented ELL sparse matrix on device (see models.problem.EllMatrix)."""

    rows: jnp.ndarray  # (n, k) int32
    vals: jnp.ndarray  # (n, k)
    num_rows: int  # static


_register(DeviceEll, ["rows", "vals"], ["num_rows"])

DeviceMatrix = Union[DeviceDense, DeviceEll]


@dataclass(frozen=True)
class DeviceBucket:
    p2f: jnp.ndarray  # (Bk, w) int32 flat index per padded slot (0 if invalid)
    mask: jnp.ndarray  # (Bk, w) dtype mask, 1.0 real / 0.0 padding
    sizes: jnp.ndarray  # (Bk,) int32 true block sizes (0 for dummy rows)
    width: int  # static
    contiguous: bool  # static: p2f == arange (scatter/gather are reshapes)


_register(DeviceBucket, ["p2f", "mask", "sizes"], ["width", "contiguous"])


@dataclass(frozen=True)
class DeviceProblem:
    A: DeviceMatrix
    b: jnp.ndarray  # (m,) single scenario or (S, m)
    buckets: tuple  # tuple[DeviceBucket, ...]
    n_flat: int  # static
    num_rows: int  # static


_register(DeviceProblem, ["A", "b", "buckets"], ["n_flat", "num_rows"])


def prepare(problem: Problem, dtype=jnp.float32) -> DeviceProblem:
    """Move a host Problem to device-side layout (single process, no mesh).

    The sharded preparation lives in bsls_tpu.parallel.sharding.
    """
    part = problem.partition
    buckets = []
    offset_check = 0
    for b in part.buckets:
        p2f = np.asarray(b.pad_to_flat)
        contiguous = bool(
            np.array_equal(p2f.ravel(), np.arange(offset_check, offset_check + p2f.size))
        )
        offset_check += p2f.size
        buckets.append(
            DeviceBucket(
                p2f=jnp.asarray(p2f, dtype=jnp.int32),
                mask=jnp.asarray(b.mask, dtype=dtype),
                sizes=jnp.asarray(b.sizes, dtype=jnp.int32),
                width=b.width,
                contiguous=contiguous,
            )
        )
    if isinstance(problem.A, DenseMatrix):
        A = DeviceDense(data=jnp.asarray(problem.A.data, dtype=dtype))
    else:
        A = DeviceEll(
            rows=jnp.asarray(problem.A.rows, dtype=jnp.int32),
            vals=jnp.asarray(problem.A.vals, dtype=dtype),
            num_rows=problem.A.num_rows,
        )
    return DeviceProblem(
        A=A,
        b=jnp.asarray(problem.b, dtype=dtype),
        buckets=tuple(buckets),
        n_flat=part.n_flat,
        num_rows=problem.A.shape[0],
    )


# ---------------- layout conversions ----------------


def flat_to_padded(dp: DeviceProblem, x_flat: jnp.ndarray):
    """Gather flat (N,) -> tuple of (B_k, w_k) padded arrays."""
    out = []
    off = 0
    for bk in dp.buckets:
        size = bk.p2f.size
        if bk.contiguous:
            out.append(jax.lax.dynamic_slice_in_dim(x_flat, off, size).reshape(bk.p2f.shape))
        else:
            out.append(x_flat[bk.p2f] * bk.mask)
        off += size
    return tuple(out)


def padded_to_flat(dp: DeviceProblem, xp) -> jnp.ndarray:
    """Scatter tuple of (B_k, w_k) padded arrays -> flat (N,)."""
    if all(bk.contiguous for bk in dp.buckets):
        return jnp.concatenate([x.reshape(-1) for x in xp])
    out = jnp.zeros((dp.n_flat,), dtype=xp[0].dtype)
    for bk, x in zip(dp.buckets, xp):
        out = out.at[bk.p2f.reshape(-1)].add((x * bk.mask).reshape(-1))
    return out


# ---------------- matvec ----------------


def matvec(A: DeviceMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x for flat x (N,)."""
    if isinstance(A, DeviceDense):
        return A.data @ x
    contrib = A.vals * x[:, None]  # (n, k)
    return jax.ops.segment_sum(
        contrib.reshape(-1), A.rows.reshape(-1), num_segments=A.num_rows
    )


def rmatvec(A: DeviceMatrix, r: jnp.ndarray) -> jnp.ndarray:
    """A^T @ r -> flat (N,)."""
    if isinstance(A, DeviceDense):
        return A.data.T @ r
    return jnp.sum(A.vals * r[A.rows], axis=1)


# ---------------- small helpers ----------------


def tree_vdot(xs, ys) -> jnp.ndarray:
    """Sum of elementwise products over a matching pair of pytrees."""
    parts = jax.tree_util.tree_map(lambda a, b: jnp.vdot(a, b), xs, ys)
    return jax.tree_util.tree_reduce(jnp.add, parts)


def feasible_init(dp: DeviceProblem, dtype=None):
    """Uniform feasible start: 1/n_i on each real block, 0 on padding."""
    xp = []
    for bk in dp.buckets:
        d = dtype or bk.mask.dtype
        inv = jnp.where(bk.sizes > 0, 1.0 / jnp.maximum(bk.sizes, 1).astype(d), 0.0)
        xp.append(bk.mask.astype(d) * inv[:, None])
    return tuple(xp)

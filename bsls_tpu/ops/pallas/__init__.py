"""Pallas TPU kernels + dispatch.

``use_pallas()`` gates the fused kernels to real TPU backends; the XLA
implementations in ops.projection / ops.isotonic remain the cross-check
and CPU path (SURVEY.md §7 step 4: keep both, benchmark, pick per bucket).
Set BSLS_NO_PALLAS=1 to force the XLA path everywhere.
"""
from __future__ import annotations

import os
from functools import lru_cache

__all__ = ["use_pallas", "proj_simplex_pallas", "pava_pallas"]


@lru_cache(maxsize=1)
def use_pallas() -> bool:
    # Both kernels are validated bit-correct on real v5e hardware
    # (2026-08-17) in their bisection/loop formulations.  Dispatch stays
    # opt-in (BSLS_PALLAS=1): measured head-to-head at the benchmark config
    # (medium x128 scenarios) the XLA paths win 5851 vs 1619 it/s — vmapped
    # pallas_call serialises over the scenario batch, and the sparse-matvec
    # gathers (not the projection) dominate anyway.  History: sort-network/
    # tri-matmul/cumsum formulations that pass interpret-mode tests
    # mis-lower via this image's Mosaic — keep kernels to elementwise ops,
    # masked lane reductions, and fori_loop(unroll=1).
    if os.environ.get("BSLS_PALLAS", "") != "1":
        return False
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


from .pava_kernel import pava_pallas  # noqa: E402
from .projection_kernel import proj_simplex_pallas  # noqa: E402


def _fold_scenarios(impl):
    """Give a ``(v (B, w), widths (B,), radius (B,)) -> (B, w)`` kernel entry
    a custom-vmap rule that FOLDS a mapped scenario axis into the block/grid
    axis — one pallas_call over (S*B, w) rows — instead of letting vmap
    serialise the pallas grid over scenarios (which cost 3.6x at S=128 in
    round 1; ROADMAP #4).  Per-(scenario, block) independence makes the fold
    exact.  Nested vmaps fold recursively."""
    import jax
    import jax.numpy as jnp

    fn = jax.custom_batching.custom_vmap(impl)

    @fn.def_vmap
    def _rule(axis_size, in_batched, v, widths, radius):
        S = axis_size

        def lead(x, batched):
            return x if batched else jnp.broadcast_to(x, (S,) + x.shape)

        v = lead(v, in_batched[0])
        widths = lead(widths, in_batched[1])
        radius = lead(radius, in_batched[2])
        B, w = v.shape[-2], v.shape[-1]
        out = fn(v.reshape(S * B, w), widths.reshape(S * B), radius.reshape(S * B))
        return out.reshape(S, B, w), True

    return fn


# production entries (default tile, compiled): scenario-folding batched forms.
# The projection uses the lane-major (transposed) kernel — blocks on VPU
# lanes: 5.9x the XLA projection and 17x the row-major kernel at the folded
# S=128 scale (measured on-chip 2026-08-17, BASELINE.md).
from .projection_kernel import proj_simplex_pallas_t  # noqa: E402

proj_simplex_pallas_b = _fold_scenarios(lambda v, w, r: proj_simplex_pallas_t(v, w, r))
pava_pallas_b = _fold_scenarios(lambda y, w, r: pava_pallas(y, w, r))
__all__ += ["proj_simplex_pallas_b", "pava_pallas_b", "proj_simplex_pallas_t"]

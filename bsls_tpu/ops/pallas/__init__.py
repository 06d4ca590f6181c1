"""Pallas TPU kernels + dispatch.

Two gates (the XLA implementations in ops.projection / ops.isotonic remain
the cross-check and CPU path — SURVEY.md §7 step 4: keep both, benchmark,
pick the winner):

* ``use_pallas()`` — the PROJECTION dispatch.  Default ON on real TPU
  backends since round 2: the lane-major kernel + scenario folding
  measured 12,957 agg it/s at medium x128 vs 6,867 for XLA (BASELINE.md).
  Set BSLS_NO_PALLAS=1 to force the XLA path.
* ``use_pallas_pava()`` — the PAVA dispatch, also default ON since the
  lane-major variant (pava_pallas_t) validated bit-correct on-chip
  (maxdiff 9.5e-7 at (400k, 8)) and beat the XLA path 1.40 vs 1.54 ms.

History: sort-network/tri-matmul/cumsum formulations that pass
interpret-mode tests mis-lower via this image's Mosaic — keep kernels to
elementwise ops, masked lane/sublane reductions, and fori_loop(unroll=1).
"""
from __future__ import annotations

import os
from functools import lru_cache

__all__ = ["use_pallas", "use_pallas_pava", "proj_simplex_pallas", "pava_pallas"]


def _on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@lru_cache(maxsize=1)
def use_pallas() -> bool:
    if os.environ.get("BSLS_NO_PALLAS", "") == "1":
        return False
    return _on_tpu()


@lru_cache(maxsize=1)
def use_pallas_pava() -> bool:
    if os.environ.get("BSLS_NO_PALLAS", "") == "1":
        return False
    return _on_tpu()


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
from .pava_kernel import pava_pallas_t  # noqa: E402
from .projection_kernel import proj_simplex_pallas_t  # noqa: E402

proj_simplex_pallas_b = _fold_scenarios(lambda v, w, r: proj_simplex_pallas_t(v, w, r))
pava_pallas_b = _fold_scenarios(lambda y, w, r: pava_pallas_t(y, w, r))
__all__ += ["proj_simplex_pallas_b", "pava_pallas_b", "proj_simplex_pallas_t"]

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

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
    # Opt-in (BSLS_PALLAS=1) until the kernels are revalidated on real
    # hardware: interpret-mode-correct kernels mis-lower via this image's
    # Mosaic (pltpu.roll wraps across physical 128-lane padding when the
    # logical width < 128), and remote-compile latency makes on-chip
    # debugging minutes-per-attempt.  The XLA paths are correct everywhere
    # and are not the current bottleneck (the sparse-matvec gathers are).
    if os.environ.get("BSLS_PALLAS", "") != "1":
        return False
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


from .pava_kernel import pava_pallas  # noqa: E402
from .projection_kernel import proj_simplex_pallas  # noqa: E402

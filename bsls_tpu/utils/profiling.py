"""Profiling hooks: jax.profiler traces + compiled cost analysis.

(SURVEY.md §5 tracing/profiling: per-kernel cost via cost_analysis, traces
via the Perfetto-compatible jax.profiler, and a roofline summary for the
speed-of-light audit in BENCH notes.)
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

__all__ = ["trace", "cost_analysis", "roofline_summary"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed block to ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> dict:
    """FLOPs / bytes-accessed estimate of the compiled fn at these args."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-computation list
        ca = ca[0] if ca else {}
    return dict(ca or {})


def roofline_summary(fn, *args, peak_flops: float = 197e12,
                     hbm_bw: float = 819e9, **kwargs) -> dict:
    """Compare a step's cost estimate with chip peaks (defaults: TPU v5e
    bf16 MXU peak and HBM bandwidth) to bound achievable step time."""
    ca = cost_analysis(fn, *args, **kwargs)
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", ca.get("bytes_accessed", 0.0)))
    t_compute = flops / peak_flops if peak_flops else 0.0
    t_memory = bytes_ / hbm_bw if hbm_bw else 0.0
    return {
        "flops": flops,
        "bytes_accessed": bytes_,
        "bound": "memory" if t_memory >= t_compute else "compute",
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "speed_of_light_s": max(t_compute, t_memory),
    }

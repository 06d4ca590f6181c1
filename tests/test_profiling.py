"""Tests for the profiling utilities (cost analysis + roofline summary)."""
import jax.numpy as jnp
import numpy as np

from bsls_tpu.models import synthetic
from bsls_tpu.ops import layout as L
from bsls_tpu.utils.profiling import cost_analysis, roofline_summary


def test_cost_analysis_of_matvec():
    prob = synthetic.tiny_dense(num_blocks=8, dim=4, m=64)
    dp = L.prepare(prob)
    x = L.padded_to_flat(dp, L.feasible_init(dp))
    ca = cost_analysis(lambda v: L.matvec(dp.A, v), x)
    assert isinstance(ca, dict)


def test_roofline_summary_fields():
    prob = synthetic.tiny_dense(num_blocks=8, dim=4, m=64)
    dp = L.prepare(prob)
    x = L.padded_to_flat(dp, L.feasible_init(dp))
    r = roofline_summary(lambda v: L.matvec(dp.A, v), x)
    assert r["bound"] in ("memory", "compute")
    assert r["speed_of_light_s"] >= 0.0

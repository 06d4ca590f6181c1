#!/usr/bin/env python
"""Honest time-to-1e-6 measurement: f64-evaluated iterates, not fp32 traces.

The fp32 device objective trace carries ~1e-5 RELATIVE evaluation noise on
the medium config (each residual entry has fp32 matvec rounding; measured
2026-08-19: fp32 trace reads ~1e-5 below the f64 objective of the same
iterate).  A 1e-6 crossing read off the fp32 trace is therefore
noise-assisted — solvers "cross" when a noise dip helps them and "stall"
when it doesn't, regardless of the true iterate quality.

This driver measures the real thing: for a geometric iteration schedule
K_1 < K_2 < ..., run solve(max_iter=K_i) (warm AOT executables make the
repeats cheap), evaluate the RETURNED iterate in float64 on the host, and
report the first K whose true relative gap is <= tol, plus the steady
iteration rate — time-to-gap = K_cross / rate.

    python benchmarks/time_to_gap.py --config medium --methods lbfgs,pgd/bb
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCHEDULE = [25, 50, 75, 100, 150, 200, 300, 400, 600, 800, 1200, 1600, 2400]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="medium")
    p.add_argument("--methods", default="lbfgs,pgd/bb,pgd/bbm")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument(
        "--refine", type=int, default=0,
        help="refine=K polish rounds after each solve; the polish wall time "
        "(res.refine_secs) is ADDED to time_to_gap_s, so the number stays "
        "honest — fp32 alone floors at ~2e-6..1e-5 true gap on medium",
    )
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bsls_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # fresh-process reruns replay compiles from disk

    import bsls_tpu as bsls
    from bsls_tpu.models import Problem, synthetic
    from bsls_tpu.models.oracle import cached_oracle_objective
    from bsls_tpu.models.synthetic import _CONFIGS

    prob = (
        Problem.load(args.config)
        if os.path.exists(args.config)
        else synthetic.make_config(args.config)
    )
    suffix = "_0"
    if prob.C is not None:  # drop eq rows: this driver measures the LSQ core
        prob = bsls.Problem(A=prob.A, b=prob.b, partition=prob.partition,
                            name=prob.name)
        suffix = "_0_noC"  # must not collide with the eq oracle's cache entry
    key = f"{args.config}{suffix}" if args.config in _CONFIGS else None
    f_star = cached_oracle_objective(prob, key)

    for item in args.methods.split(","):
        method, _, ls = item.strip().partition("/")
        ls = ls or "exact"
        cross_k, rate, gap_at_cross, refine_secs = None, None, None, 0.0
        for K in SCHEDULE:
            res = bsls.solve(prob, method=method, line_search=ls, tol=0.0,
                             max_iter=K, chunk=args.chunk, refine=args.refine)
            f64 = prob.objective_np(np.asarray(res.x, np.float64))
            rel = (float(f64) - f_star) / max(1.0, abs(f_star))
            rate = res.steady_iters_per_sec()
            if rel <= args.tol:
                cross_k, gap_at_cross = K, rel
                refine_secs = res.refine_secs
                break
        row = {
            "config": prob.name,
            "method": method,
            "line_search": ls,
            "tol": args.tol,
            "f_star": f_star,
            "refine": args.refine,
            "cross_iter_le": cross_k,  # first schedule point at/below tol
            "rel_gap_at_cross": gap_at_cross,
            "steady_iters_per_sec": None if rate is None else round(rate, 2),
            "refine_secs": round(refine_secs, 3),
            "time_to_gap_s": (
                None if (cross_k is None or not rate)
                else round(cross_k / rate + refine_secs, 3)
            ),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

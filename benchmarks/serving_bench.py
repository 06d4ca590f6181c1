#!/usr/bin/env python
"""Serving-endpoint latency benchmark (config 3's production shape).

Streams equality-constrained solve requests (2% perturbed b, the
round-to-round sensor drift of a route-flow deployment) through a warm
Endpoint and reports cold (first-request, includes compile) and warm
(median of --requests) latencies plus final eq-violation.

    python benchmarks/serving_bench.py --method lbfgs --requests 5
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="traffic")
    p.add_argument("--method", default="apgd")
    p.add_argument("--requests", type=int, default=5)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--perturb", type=float, default=0.02)
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

    from bsls_tpu.models import synthetic
    from bsls_tpu.serving import Endpoint

    prob = synthetic.make_config(args.config)
    ep = Endpoint(prob, method=args.method, chunk=200)
    rng = np.random.default_rng(1)
    b0 = np.asarray(prob.b)

    lat, viol, conv = [], [], []
    for i in range(args.requests + 1):  # +1: request 0 is the cold compile
        b = b0 * (1.0 + args.perturb * rng.standard_normal(b0.shape))
        t0 = time.perf_counter()
        res = ep.solve(b.astype(np.float32), tol=args.tol)
        lat.append(time.perf_counter() - t0)
        v = getattr(res, "eq_violation", None)
        viol.append(float(v) if v is not None else 0.0)
        conv.append(bool(res.converged))
    row = {
        "config": prob.name,
        "method": args.method,
        "tol": args.tol,
        "cold_s": round(lat[0], 3),
        "warm_median_s": round(float(np.median(lat[1:])), 3),
        "warm_all_s": [round(t, 3) for t in lat[1:]],
        "eq_violation_max": float(np.max(viol[1:])) if prob.C is not None else None,
        "all_converged": all(conv[1:]),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
    return row


if __name__ == "__main__":
    main()

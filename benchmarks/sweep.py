#!/usr/bin/env python
"""Full benchmark sweep (config 5: FW + EG + PG(+PAVA) on a large instance).

    python benchmarks/sweep.py --config medium --scenarios 32 --out sweep.jsonl

Runs every solver family on the chosen instance, records iterations/s,
final objective, FW gap, and (with --oracle) time-to-1e-6 relative gap.
Appends one JSON line per (solver, line_search) to --out and prints a
summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SWEEP = [
    ("pgd", "exact"),
    ("pgd", "bb"),
    ("pgd", "bbm"),
    ("pgd", "pava"),
    ("apgd", "exact"),
    ("lbfgs", "exact"),
    ("eg", "exact"),
    ("frank_wolfe", "exact"),
    ("afw", "exact"),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="medium")
    p.add_argument("--scenarios", type=int, default=1)
    p.add_argument("--max-iter", type=int, default=600)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--tol", type=float, default=0.0)
    p.add_argument("--oracle", action="store_true")
    p.add_argument("--lbfgs-mem", type=int, default=8)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument(
        "--methods", default=None,
        help="comma list of method[/ls] pairs to run (default: the full "
        "sweep); e.g. --methods pgd/pava,lbfgs — lets large instances run "
        "one method per fresh process (in-process HBM accumulation breaks "
        "later compiles at the 8M-var scale)",
    )
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
    from bsls_tpu.models.synthetic import _CONFIGS, with_scenarios

    prob = (
        Problem.load(args.config)
        if os.path.exists(args.config)
        else synthetic.make_config(args.config)
    )
    suffix = "_0"
    if prob.C is not None:
        prob = bsls.Problem(A=prob.A, b=prob.b, partition=prob.partition, name=prob.name)
        suffix = "_0_noC"  # must not collide with the eq oracle's cache entry
    f_star = None
    if args.oracle:
        key = f"{args.config}{suffix}" if args.config in _CONFIGS else None
        f_star = cached_oracle_objective(prob, key)
    if args.scenarios > 1:
        prob = with_scenarios(prob, args.scenarios)

    sweep = SWEEP
    if args.methods:
        want = []
        for item in args.methods.split(","):
            m, _, l = item.strip().partition("/")
            want.append((m, l or None))
        sweep = [
            (m, ls) for m, ls in SWEEP
            if any(m == wm and (wl is None or ls == wl) for wm, wl in want)
        ]

    rows = []
    for method, ls in sweep:
        try:
            res = bsls.solve(
                prob, method=method, line_search=ls, tol=args.tol,
                max_iter=args.max_iter, chunk=args.chunk,
                lbfgs_mem=args.lbfgs_mem,
            )
        except Exception as e:  # one method failing must not kill the sweep
            print(json.dumps({
                "config": prob.name, "method": method, "line_search": ls,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)
            continue
        ips = args.scenarios * res.steady_iters_per_sec()
        row = {
            "config": prob.name,
            "method": method,
            "line_search": ls,
            "scenarios": args.scenarios,
            "iters": int(res.iterations),
            "iters_per_sec": round(ips, 2),
            "objective": float(np.max(np.asarray(res.objective))),
            "fw_gap": float(np.max(np.asarray(res.gap))),
            "device": str(jax.devices()[0]),
        }
        if f_star is not None:
            row["rel_gap_vs_oracle"] = (row["objective"] - f_star) / max(1.0, abs(f_star))
            t6 = res.time_to_gap(f_star, rel=1e-6)
            row["time_to_1e-6_gap_s"] = None if t6 is None else round(t6, 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")

    # summary
    print(f"\n{'method':14s} {'ls':6s} {'it/s':>10s} {'objective':>14s} {'gap':>10s}")
    for r in rows:
        print(
            f"{r['method']:14s} {r['line_search']:6s} {r['iters_per_sec']:>10.1f} "
            f"{r['objective']:>14.6e} {r['fw_gap']:>10.2e}"
        )
    return rows


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""On-chip probe for the config-4 (8M-var) memory envelope.

Round 4's certified-reference run died RESOURCE_EXHAUSTED inside the main
pgd/bb chunk loop (/tmp/ttg_large_r4.log); this probe reproduces the exact
solve shape in stages with flushing progress + device memory_stats so the
failure point (if any) is visible, instead of a 147-byte silent log.

    python benchmarks/probe_large.py [--iters 300] [--refine 0] [--method pgd/bb]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def memgb():
    import jax

    try:
        ms = jax.devices()[0].memory_stats()
        return {k: round(v / 2**30, 3) for k, v in ms.items()
                if "bytes" in k and v}
    except Exception as e:  # memory_stats is backend-optional
        return {"err": str(e)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--method", default="pgd/bb")
    p.add_argument("--refine", type=int, default=0)
    p.add_argument("--refine-cert", type=int, default=0)
    p.add_argument("--tol", type=float, default=0.0)
    args = p.parse_args()

    from bsls_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    import bsls_tpu as bsls
    from bsls_tpu.models import Problem

    t0 = time.perf_counter()
    ipath = os.path.join(os.environ.get("BSLS_CACHE_DIR", ".bench"),
                         "instance_large.npz")
    prob = Problem.load(ipath)
    print(f"[{time.perf_counter()-t0:7.1f}s] loaded {prob.shape} "
          f"S={prob.num_scenarios}", flush=True)
    m, _, ls = args.method.partition("/")
    res = bsls.solve(prob, method=m, line_search=ls or "exact",
                     tol=args.tol, max_iter=args.iters, chunk=args.chunk,
                     refine=args.refine,
                     refine_tol=(args.tol or 1e-6) if args.refine_cert else None)
    print(f"[{time.perf_counter()-t0:7.1f}s] solve done it={res.iterations} "
          f"f={np.asarray(res.objective)} mem={memgb()}", flush=True)
    f64 = np.asarray(prob.objective_np(np.asarray(res.x, np.float64)))
    print(f"[{time.perf_counter()-t0:7.1f}s] f64 objective {f64}", flush=True)


if __name__ == "__main__":
    main()

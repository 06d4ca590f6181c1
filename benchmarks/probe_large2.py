#!/usr/bin/env python
"""Staged config-4 on-chip probe: find WHICH stage kills the TPU worker.

Round-5 finding: both pgd/bb and pgd/exact on the 8M-var instance crash the
axon worker inside the first chunk-loop sync (/tmp/probe_large_exact.log),
where round 2 measured 2.32 agg it/s on the same config.  Each stage below
blocks and prints device memory before moving on, so the log names the
killer.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from probe_large import memgb  # shared device memory_stats helper


def main():
    from bsls_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bsls_tpu.models import Problem
    from bsls_tpu.ops import layout as L
    from bsls_tpu.solvers.base import power_lipschitz

    t0 = time.perf_counter()

    def stage(msg):
        print(f"[{time.perf_counter()-t0:7.1f}s] {msg} mem={memgb()}",
              flush=True)

    ipath = os.path.join(os.environ.get("BSLS_CACHE_DIR", ".bench"),
                         "instance_large.npz")
    prob = Problem.load(ipath)
    stage(f"loaded {prob.shape} S={prob.num_scenarios}")
    dp = L.prepare(prob, dtype=jnp.float32)
    jax.block_until_ready(dp.b)
    stage("prepared/uploaded")
    from dataclasses import replace

    Lv = float(power_lipschitz(replace(dp, b=dp.b[0])))
    stage(f"power iteration L={Lv:.3e}")
    x = jnp.zeros((dp.b.shape[0], dp.perm.shape[0]), jnp.float32)

    mv = jax.jit(jax.vmap(lambda xx: L.matvec(dp.A, xx)))
    y = jax.block_until_ready(mv(x))
    stage(f"vmapped matvec ok {y.shape}")
    rv = jax.jit(jax.vmap(lambda rr: L.rmatvec(dp.A, rr)))
    g = jax.block_until_ready(rv(dp.b))
    stage(f"vmapped rmatvec ok {g.shape}")

    import bsls_tpu as bsls

    res = bsls.solve(prob, method="pgd", tol=0.0, max_iter=25, chunk=25)
    stage(f"solve 25 iters ok f={np.asarray(res.objective)}")
    res = bsls.solve(prob, method="pgd", tol=0.0, max_iter=200, chunk=25)
    stage(f"solve 200 iters ok f={np.asarray(res.objective)}")


if __name__ == "__main__":
    main()

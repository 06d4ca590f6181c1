"""Test configuration: run everything on a simulated 8-device CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (one real TPU chip behind a
tunnel) and its sitecustomize re-pins jax_platforms at import, so plain env
vars are not enough — we must update jax.config before the backend
initialises.  Real-TPU validation happens through bench.py / benchmarks, not
the unit suite (SURVEY.md §4b).  Opt into TPU tests with BSLS_TEST_TPU=1.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("BSLS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

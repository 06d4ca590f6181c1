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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # The XLA CPU collective rendezvous ships a 40 s termination deadline:
    # if the 8 virtual-device threads (4 physical cores here) miss it —
    # which happens when benches/oracles load the machine concurrently —
    # XLA calls abort() and kills the whole pytest process (diagnosed
    # round 4: "Termination timeout for `all reduce ...` of 40 seconds
    # exceeded", rendezvous.cc).  Tests check correctness, not latency;
    # give the rendezvous 10 minutes.
    flags = (flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
             " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120").strip()
os.environ["XLA_FLAGS"] = flags

if not os.environ.get("BSLS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

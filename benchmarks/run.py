#!/usr/bin/env python
"""Benchmark / experiment CLI — thin shim over the installed package CLI
(``bsls_tpu.cli``; also available as ``python -m bsls_tpu`` / ``bsls``).

    python benchmarks/run.py --preset medium-pgd
    python benchmarks/run.py --config tiny --method apgd --tol 1e-8
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bsls_tpu.cli import build_parser, main  # noqa: F401  (re-exported)

if __name__ == "__main__":
    main()

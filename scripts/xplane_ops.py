#!/usr/bin/env python
"""Summarize device-side XLA op durations from a jax.profiler xplane trace.

Usage: python scripts/xplane_ops.py <trace_dir> [top_n]

Thin shim over ``action_conditioned_gans_tpu.utils.xplane`` (the analysis
moved into the package so ``acgan profile-report`` and tests share it);
``summarize`` keeps returning the historical tuple rows.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from action_conditioned_gans_tpu.utils.xplane import (  # noqa: E402,F401
    PEAK_BW,
    PEAK_FLOPS,
    summarize,
)

if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)

"""Opt-in persistent XLA compilation cache.

Every new process on this platform pays full compile time (CLAUDE.md
platform rule 5: "Compile cache does not persist across processes" — that
note describes JAX's *default* in-memory cache; nothing ever configured the
persistent one). Preset compiles measured 8-37 s (BENCH_PRESETS.json
``compile_s``), so a bench sweep, a restart-after-preemption, or a serving
cold-start each repay it. Pointing ``ACGAN_COMPILE_CACHE_DIR`` at a
directory enables JAX's persistent compilation cache: serialized XLA
executables keyed by (program, flags, platform) are written there and
reloaded by later processes.

Opt-in, default off: whether the axon remote-compile helper supports
executable serialization is a hardware question (the round-4 on-chip queue
probes it — see scripts/r4_onchip.sh cache probe); on CPU meshes it is
pure win but tests intentionally measure cold compiles. A cache MISS
compiles exactly as before, so the knob cannot change numerics — only
where the executable bytes come from.

SURVEY.md §6 (aux subsystems) context: the reference (TF1) relied on
``tf.Session`` graph caching within one process and had no cross-process
story either; this is the TPU-native equivalent of shipping a warmed AOT
artifact next to the checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV_DIR = "ACGAN_COMPILE_CACHE_DIR"
_ENV_MIN_SECS = "ACGAN_COMPILE_CACHE_MIN_SECS"


def maybe_enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache if configured.

    ``path`` overrides the ``ACGAN_COMPILE_CACHE_DIR`` env var. Returns the
    cache directory when enabled, ``None`` when the knob is unset. Safe to
    call more than once and safe to call after ``import jax`` (the config
    is read at compile time, not import time); call it BEFORE the first
    ``jit`` execution you want cached.
    """
    path = path or os.environ.get(_ENV_DIR)
    if not path:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Default floor of 1 s skips tiny programs (cache I/O would dominate);
    # override to 0 to cache everything (tests do, so CPU toys persist).
    raw_min = os.environ.get(_ENV_MIN_SECS, "1.0")
    try:
        min_secs = float(raw_min)
    except ValueError as e:
        # Name the knob: this runs before every subcommand (and in bench.py
        # before the first jit), so a bare float('') traceback would be the
        # only clue otherwise.
        raise ValueError(
            f"{_ENV_MIN_SECS}={raw_min!r} is not a number (seconds)"
        ) from e
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    return path

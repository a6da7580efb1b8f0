"""Persistent compile cache (utils/compile_cache.py): cross-process reuse.

The claim is exactly "a later PROCESS reloads the serialized executable", so
the test runs the same jitted program in two subprocesses sharing one cache
dir: the first must populate it, the second must add nothing new (pure
hits). Platform forced to CPU with the config knob (conftest note: env vars
alone do not override an auto-registered TPU plugin) so the suite never
touches the tunnel.
"""

import os
import subprocess
import sys

PROG = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from action_conditioned_gans_tpu.utils.compile_cache import (
    maybe_enable_compile_cache,
)
d = maybe_enable_compile_cache()
assert d == sys.argv[1], (d, sys.argv[1])
assert jax.config.jax_compilation_cache_dir == d
import jax.numpy as jnp

@jax.jit
def f(x):
    return jnp.tanh(x @ x.T).sum()

x = jnp.full((64, 64), 0.01, jnp.float32)
print(float(f(x)))
"""


def _run(cache_dir, tmp_path):
    prog = tmp_path / "prog.py"
    prog.write_text(PROG)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        ACGAN_COMPILE_CACHE_DIR=str(cache_dir),
        # Cache even instant CPU compiles (default floor is 1 s).
        ACGAN_COMPILE_CACHE_MIN_SECS="0",
        # sys.path[0] is the script's dir (tmp_path), not cwd — the package
        # resolves from the repo. Forcing CPU above makes losing the axon
        # PYTHONPATH entry harmless here (CLAUDE.md PYTHONPATH note).
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    r = subprocess.run(
        [sys.executable, str(prog), str(cache_dir)],
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr
    return float(r.stdout.strip().splitlines()[-1])


def test_cache_persists_across_processes(tmp_path):
    cache = tmp_path / "cache"
    v1 = _run(cache, tmp_path)
    entries = sorted(os.listdir(cache))
    assert entries, "first process wrote no cache entries"
    v2 = _run(cache, tmp_path)
    assert sorted(os.listdir(cache)) == entries, (
        "second process should hit, not repopulate"
    )
    assert v1 == v2


def test_bad_min_secs_names_the_env_var(tmp_path, monkeypatch):
    """A malformed ACGAN_COMPILE_CACHE_MIN_SECS must fail naming the knob —
    this runs before every subcommand, so a bare float('') traceback would
    be the only clue otherwise."""
    import pytest

    from action_conditioned_gans_tpu.utils.compile_cache import (
        maybe_enable_compile_cache,
    )

    monkeypatch.setenv("ACGAN_COMPILE_CACHE_DIR", str(tmp_path / "c"))
    monkeypatch.setenv("ACGAN_COMPILE_CACHE_MIN_SECS", "")
    with pytest.raises(ValueError, match="ACGAN_COMPILE_CACHE_MIN_SECS"):
        maybe_enable_compile_cache()


def test_knob_off_is_inert():
    from action_conditioned_gans_tpu.utils.compile_cache import (
        maybe_enable_compile_cache,
    )

    old = os.environ.pop("ACGAN_COMPILE_CACHE_DIR", None)
    try:
        assert maybe_enable_compile_cache() is None
    finally:
        if old is not None:
            os.environ["ACGAN_COMPILE_CACHE_DIR"] = old

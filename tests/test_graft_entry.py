"""Tests for the driver-facing ``__graft_entry__`` artifact.

Round 1 shipped a correct dryrun that the driver could not run (the axon TPU
plugin hijacked the platform and handed it 1 device — VERDICT.md missing item
1, weak item 4). These tests run the exact artifact the driver executes, in
the exact ways it can break:

1. in-process on the conftest 8-virtual-device CPU mesh (fast path);
2. in a subprocess whose jax backend was ALREADY initialized with a single
   device before ``dryrun_multichip(8)`` is called — the hijack scenario —
   which must succeed via the scrubbed-subprocess re-exec;
3. ``entry()`` compile-check, mirroring the driver's single-chip check.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides=None, timeout=900):
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_NUM_CPU_DEVICES"] = ""  # no stray influence
    env.pop("JAX_NUM_CPU_DEVICES")
    if env_overrides:
        env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape  # next-frame prediction, same geometry
    assert bool(jax.numpy.isfinite(out).all())


def test_dryrun_multichip_inprocess():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    # conftest already initialized 8 cpu devices; the in-process path runs.
    g.dryrun_multichip(8)


def test_dryrun_multichip_reexecs_when_platform_hijacked():
    """Simulate the driver-side failure: the process's backend is already
    initialized with ONE device when dryrun_multichip(8) is called. The entry
    point must detect this and re-exec in a scrubbed subprocess."""
    code = (
        "import os, sys; sys.path.insert(0, {repo!r});\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    ).format(repo=REPO)
    proc = _run(code)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "DRYRUN_OK" in proc.stdout

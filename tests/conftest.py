"""Test harness: run everything on CPU with 8 virtual devices.

This is the SURVEY.md §5.4 strategy — distributed tests without a cluster
via ``--xla_force_host_platform_device_count=8``. Must run before jax is
imported anywhere.
"""

import os

_TPU_PARITY = bool(os.environ.get("ACGAN_PALLAS_TPU_PARITY"))
if not _TPU_PARITY:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# Keep CPU test runs deterministic and quiet.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# Tests measure COLD compiles and call cli.main in-process: an ambient
# ACGAN_COMPILE_CACHE_DIR from the developer's shell (RUNBOOK advice) would
# otherwise flip the persistent cache on for the whole pytest process and
# write CPU-toy executables into the user's real cache dir. Tests that want
# the cache (test_compile_cache.py) set the env explicitly in subprocesses.
os.environ.pop("ACGAN_COMPILE_CACHE_DIR", None)
os.environ.pop("ACGAN_COMPILE_CACHE_MIN_SECS", None)

import jax  # noqa: E402

if not _TPU_PARITY:
    # Hardware parity mode (ACGAN_PALLAS_TPU_PARITY=1; VERDICT r2 weak 8)
    # leaves the real TPU platform active so the Pallas kernels go through
    # the ACTUAL Mosaic lowering instead of interpret mode. Run ONLY the
    # kernel parity files that way:
    #   ACGAN_PALLAS_TPU_PARITY=1 python -m pytest \
    #       tests/test_pallas.py tests/test_gn_backward.py -q
    # (documented in docs/KERNELS.md). Default: the env var alone does not
    # win over an auto-registered TPU PJRT plugin (e.g. the axon tunnel);
    # the config knob does.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

"""Environment / platform diagnostics: ``acgan doctor``.

Operational failure-detection tooling (SURVEY.md §6 failure-detection row,
extended): the TPU platform this framework targets has documented failure
modes where ANY in-process jax call — including ``jax.devices()`` itself —
can hang indefinitely (wedged remote compile helper, full tunnel outages;
BASELINE.md methodology notes). A hung in-process client can never retry,
so every device check here runs in a SUBPROCESS with a timeout, the same
discipline bench.py's canary uses. ``doctor`` gives users one command that
says which layer is broken: the device/tunnel, the native I/O library, the
optional TF dependency, the data directory, or the checkpoint dir.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
from typing import Dict, Optional

# Tiny jit + REAL value read (readiness events are not completion barriers
# on the tunneled platform): proves dispatch, compile, execute, and fetch
# all work. Optionally forces a platform first (tests force "cpu"; env vars
# alone cannot override a plugin platform, so it must happen in-process
# inside the probe).
_PROBE = """
import json, time
t0 = time.time()
import jax
if {platform!r}:
    jax.config.update("jax_platforms", {platform!r})
import jax.numpy as jnp
ds = jax.devices()
v = float(jax.device_get(jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones((128, 128)))))
print(json.dumps({{
    "platform": ds[0].platform,
    "devices": len(ds),
    "probe_value_ok": v == 128 * 128 * 3.0,
    "seconds": round(time.time() - t0, 2),
}}))
"""


def _versions() -> Dict[str, str]:
    import importlib.metadata as md

    out = {"python": sys.version.split()[0]}
    for dist in ("jax", "jaxlib", "flax", "optax", "orbax-checkpoint",
                 "numpy", "tensorflow", "pillow"):
        try:
            out[dist] = md.version(dist)
        except md.PackageNotFoundError:
            out[dist] = "absent"
    return out


def _device_probe(timeout: int, platform: Optional[str]) -> Dict[str, object]:
    """Run the jit-and-fetch canary in a subprocess; a hang or crash is a
    diagnosis, not an exception."""
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE.format(platform=platform or "")],
            timeout=timeout,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "error": (
                f"device probe hung past {timeout}s — on the tunneled TPU "
                "platform this means a wedged compile helper or a tunnel "
                "outage (known failure modes; they recover in ~10-60 min, "
                "outages can last hours). Nothing client-side fixes it; "
                "retry later. A hung probe holds no TPU lease."
            ),
        }
    if r.returncode != 0:
        return {
            "ok": False,
            "error": f"device probe exited {r.returncode}",
            "stderr_tail": r.stderr.strip().splitlines()[-3:],
        }
    try:
        info = json.loads(r.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return {"ok": False, "error": "device probe printed no JSON",
                "stdout_tail": r.stdout.strip().splitlines()[-3:]}
    info["ok"] = bool(info.pop("probe_value_ok", False))
    info["wall_seconds"] = round(time.time() - t0, 2)
    return info


def _native_lib() -> Dict[str, object]:
    try:
        from action_conditioned_gans_tpu.data import native_tfrecord as nt

        lib = nt.load_library()
        return {"ok": True, "abi_version": nt._lib_abi(lib)}
    except Exception as e:  # toolchain-less host, ABI mismatch, ...
        return {"ok": False, "error": f"{type(e).__name__}: {e}"}


def _tf_available() -> Dict[str, object]:
    """Import TF in a subprocess: a broken TF install must not take the
    doctor process down with it (and the import is heavy)."""
    code = "import tensorflow as tf; print(tf.__version__)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=120, capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": "tensorflow import hung past 120s"}
    if r.returncode != 0:
        return {"ok": False, "error": "tensorflow import failed",
                "stderr_tail": r.stderr.strip().splitlines()[-2:]}
    return {"ok": True, "version": r.stdout.strip().splitlines()[-1]}


def _data_dir(cfg) -> Dict[str, object]:
    d = cfg.data
    if not d.data_dir:
        return {"ok": True, "skipped": "data.data_dir not set (synthetic source)"}
    pattern = (
        d.data_dir
        if any(ch in os.path.basename(d.data_dir) for ch in "*?[")
        else os.path.join(d.data_dir, "*.tfrecord*")
    )
    files = sorted(glob.glob(pattern))
    if not files:
        return {"ok": False, "error": f"no TFRecord files match {pattern}"}
    out: Dict[str, object] = {"ok": True, "files": len(files),
                              "bytes": sum(os.path.getsize(f) for f in files)}
    try:
        from action_conditioned_gans_tpu.data import native_tfrecord as nt

        clip = next(
            nt.read_clips(
                files[0], d.clip_len, d.raw_image_size, d.raw_image_size,
                cfg.model.action_dim, cfg.model.state_dim or 3,
                d.tfrecord_image_key, encoding=d.tfrecord_encoding,
            )
        )
        out["first_clip"] = {
            "frames": list(clip[0].shape),
            "actions": list(clip[1].shape),
            "states": list(clip[2].shape),
        }
    except StopIteration:
        out["ok"] = False
        out["error"] = f"{files[0]} contains no records"
    except Exception as e:
        out["ok"] = False
        out["error"] = f"first record unreadable: {type(e).__name__}: {e}"
    return out


def _checkpoints(cfg) -> Dict[str, object]:
    ckpt_dir = os.path.join(cfg.workdir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return {"ok": True, "skipped": f"no checkpoint dir at {ckpt_dir}"}
    steps = sorted(
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(ckpt_dir, "*"))
        if os.path.basename(p).isdigit()
    )
    return {"ok": True, "steps": steps[-5:], "latest": steps[-1] if steps else None}


def run_doctor(
    cfg, probe_timeout: int = 120, platform: Optional[str] = None
) -> Dict[str, object]:
    """All checks, failure-tolerant; ``ok`` is the AND of the non-skipped
    checks (the TF check is informational — the native reader covers
    TF-free hosts by design, RUNBOOK)."""
    report: Dict[str, object] = {
        "versions": _versions(),
        "device": _device_probe(probe_timeout, platform),
        "native_lib": _native_lib(),
        "tensorflow": _tf_available(),
        "data_dir": _data_dir(cfg),
        "checkpoints": _checkpoints(cfg),
    }
    report["ok"] = all(
        bool(report[k].get("ok"))
        for k in ("device", "native_lib", "data_dir", "checkpoints")
    )
    return report

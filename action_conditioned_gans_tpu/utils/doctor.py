"""Environment / platform diagnostics: ``acgan doctor``.

Operational failure-detection tooling (SURVEY.md §6 failure-detection row,
extended): the TPU platform this framework targets has documented failure
modes where ANY in-process jax call — including ``jax.devices()`` itself —
can hang indefinitely (wedged remote compile helper, full tunnel outages;
BASELINE.md methodology notes). A hung in-process client can never retry,
so every device check here runs in a SUBPROCESS with a timeout, the same
discipline bench.py's canary uses (bench.py imports ``device_probe`` from
here — ONE definition of the canonical dispatch+compile+execute+fetch
probe). ``doctor`` gives users one command that says which layer is
broken: the device/tunnel, the native I/O library, the optional TF
dependency, the data directory, or the checkpoint dir.
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
# inside the probe). Shared with bench.py's canary.
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
    "probe_value": v,
    "seconds": round(time.time() - t0, 2),
}}))
"""
_PROBE_WANT = 128 * 128 * 3.0


def _end_probe(proc: subprocess.Popen, grace: float = 15.0) -> None:
    """Stop a timed-out probe WITHOUT SIGKILL-ing a possible TPU lease
    holder: in the wedged-compile-helper mode the probe has already opened
    the TPU client (jax.devices() worked; the hang is in the jit), and a
    SIGKILL there wedges the device lease for ~10-15 min — sabotaging the
    very retry loop the caller is running. SIGTERM first (the client
    releases cleanly), hard kill only if that is ignored."""
    proc.terminate()
    try:
        proc.wait(timeout=grace)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()


def device_probe(timeout: int, platform: Optional[str] = None) -> Dict[str, object]:
    """Run the jit-and-fetch canary in a subprocess; a hang or crash is a
    diagnosis, not an exception. Returns at least {"ok": bool} plus either
    probe stats or an "error" explanation."""
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-c", _PROBE.format(platform=platform or "")],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        _end_probe(proc)
        return {
            "ok": False,
            "error": (
                f"device probe hung past {timeout}s — on the tunneled TPU "
                "platform this means a wedged compile helper or a tunnel "
                "outage (known failure modes; wedges recover in ~10-60 min, "
                "outages can last hours). Nothing client-side fixes it; "
                "retry later. The probe was stopped with SIGTERM so a held "
                "device lease releases cleanly."
            ),
        }
    if proc.returncode != 0:
        return {
            "ok": False,
            "error": f"device probe exited {proc.returncode}",
            "stderr_tail": err.strip().splitlines()[-3:],
        }
    try:
        info = json.loads(out.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return {"ok": False, "error": "device probe printed no JSON",
                "stdout_tail": out.strip().splitlines()[-3:]}
    value = info.pop("probe_value", None)
    info["ok"] = value == _PROBE_WANT
    if not info["ok"]:
        info["error"] = (
            f"device computed a WRONG probe value ({value}, expected "
            f"{_PROBE_WANT}) — numerics-corrupting platform fault"
        )
    info["wall_seconds"] = round(time.time() - t0, 2)
    return info


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


def _native_lib() -> Dict[str, object]:
    try:
        from action_conditioned_gans_tpu.data import native_tfrecord as nt

        lib = nt.load_library()
        return {"ok": True, "abi_version": nt._lib_abi(lib)}
    except Exception as e:  # toolchain-less host, ABI mismatch, ...
        return {"ok": False, "error": f"{type(e).__name__}: {e}"}


def _start_tf_check() -> subprocess.Popen:
    """TF import in a subprocess (heavy, and a broken install must not take
    doctor down); started early so it overlaps the device probe."""
    return subprocess.Popen(
        [sys.executable, "-c", "import tensorflow as tf; print(tf.__version__)"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _collect_tf_check(proc: subprocess.Popen, timeout: int) -> Dict[str, object]:
    try:
        out, err = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        return {"ok": False, "error": f"tensorflow import hung past {timeout}s"}
    if proc.returncode != 0:
        return {"ok": False, "error": "tensorflow import failed",
                "stderr_tail": err.strip().splitlines()[-2:]}
    return {"ok": True, "version": out.strip().splitlines()[-1]}


def _data_dir(cfg, dir_path: Optional[str] = None) -> Dict[str, object]:
    d = cfg.data
    if d.source not in ("tfrecord", "tfrecord_native"):
        # A leftover data_dir must not fail a run that never reads it.
        return {"ok": True, "skipped": f"source={d.source!r} reads no files"}
    dir_path = dir_path or d.data_dir
    if not dir_path:
        return {"ok": False, "error": f"source={d.source!r} but data.data_dir unset"}
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        tfrecord_file_pattern,
    )

    pattern = tfrecord_file_pattern(dir_path)
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


def _eval_data_dir(cfg) -> Dict[str, object]:
    """Validate the held-out split exactly like the training dir. When
    eval_data_dir is unset, eval falls back to data_dir — flagged here as
    an informational note, not a failure (legal, but eval metrics then
    measure the training clips)."""
    d = cfg.data
    if d.source not in ("tfrecord", "tfrecord_native"):
        return {"ok": True, "skipped": f"source={d.source!r} reads no files"}
    if not d.eval_data_dir:
        return {
            "ok": True,
            "skipped": "eval_data_dir unset — evaluate()/sample() will read "
            "the TRAINING data_dir (fine for smoke checks; set "
            "data.eval_data_dir to a validation split for honest eval)",
        }
    return _data_dir(cfg, d.eval_data_dir)


def _checkpoints(cfg) -> Dict[str, object]:
    ckpt_dir = os.path.join(cfg.workdir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return {"ok": True, "skipped": f"no checkpoint dir at {ckpt_dir}"}
    entries = [os.path.basename(p) for p in glob.glob(os.path.join(ckpt_dir, "*"))]
    steps = sorted(int(e) for e in entries if e.isdigit())
    if steps:
        return {"ok": True, "steps": steps[-5:], "latest": steps[-1]}
    if not entries:
        # CheckpointManager creates the dir eagerly at train startup
        # (utils/checkpoint.py), so an EMPTY dir is the normal state of any
        # fresh or pre-first-checkpoint run — healthy, with a note.
        return {
            "ok": True,
            "note": f"{ckpt_dir} exists but is empty (fresh run or before "
            "the first checkpoint_every boundary); --resume would start over",
        }
    if all("orbax" in e or e.startswith("tmp") for e in entries):
        return {"ok": True, "note": "async save in progress (orbax tmp dirs only)"}
    # Non-empty but NO restorable numeric step — foreign/corrupt contents;
    # --resume would silently start from scratch (ADVICE r3: this branch
    # used to report healthy, leaving the report-level gate dead).
    return {
        "ok": False,
        "error": f"{ckpt_dir} is non-empty ({entries[:5]}) but contains no "
        "numeric step dirs — nothing is restorable; a --resume run would "
        "start over",
    }


def run_doctor(
    cfg, probe_timeout: int = 120, platform: Optional[str] = None
) -> Dict[str, object]:
    """All checks, failure-tolerant; ``ok`` is the AND of the non-skipped
    checks (the TF check is informational — the native reader covers
    TF-free hosts by design, RUNBOOK). The two subprocess checks (device
    probe, TF import) run concurrently so a dead tunnel costs one timeout,
    not two."""
    tf_proc = _start_tf_check()
    report: Dict[str, object] = {
        "versions": _versions(),
        "device": device_probe(probe_timeout, platform),
        "native_lib": _native_lib(),
        "tensorflow": _collect_tf_check(tf_proc, timeout=120),
        "data_dir": _data_dir(cfg),
        "eval_data_dir": _eval_data_dir(cfg),
        "checkpoints": _checkpoints(cfg),
    }
    report["ok"] = all(
        bool(report[k].get("ok"))
        for k in ("device", "native_lib", "data_dir", "eval_data_dir", "checkpoints")
    )
    return report

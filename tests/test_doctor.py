"""Tests for `acgan doctor` (utils/doctor.py): subprocess device probe,
native-lib/ABI check, data-dir validation, and the CLI wiring.

The probe subprocess inherits the real environment (it must — diagnosing
THAT environment is the point), so every test forces platform="cpu" inside
the probe; the suite's own in-process cpu config cannot reach a subprocess.
"""

import dataclasses
import json

import numpy as np

from action_conditioned_gans_tpu.config import get_preset
from action_conditioned_gans_tpu.utils import doctor


def test_device_probe_cpu_ok():
    info = doctor.device_probe(timeout=300, platform="cpu")
    assert info["ok"], info
    assert info["platform"] == "cpu"
    assert info["devices"] >= 1


def test_device_probe_hang_is_diagnosed(monkeypatch):
    monkeypatch.setattr(doctor, "_PROBE", "import time; time.sleep(60)")
    info = doctor.device_probe(timeout=2, platform=None)
    assert not info["ok"]
    assert "hung past 2s" in info["error"]
    assert "SIGTERM" in info["error"]  # never SIGKILL a lease holder first


def test_device_probe_crash_is_diagnosed(monkeypatch):
    monkeypatch.setattr(doctor, "_PROBE", "import sys; sys.exit(7)")
    info = doctor.device_probe(timeout=60, platform=None)
    assert not info["ok"]
    assert "exited 7" in info["error"]


def test_device_probe_wrong_value_is_explained(monkeypatch):
    # NB: no literal braces — device_probe str.format()s the template.
    monkeypatch.setattr(
        doctor,
        "_PROBE",
        "import json; print(json.dumps(dict(platform='x', devices=1, "
        "probe_value=1.0, seconds=0.0)))",
    )
    info = doctor.device_probe(timeout=60, platform=None)
    assert not info["ok"]
    assert "WRONG probe value (1.0" in info["error"]


def test_data_dir_checks(tmp_path):
    cfg = get_preset("config1")
    # synthetic source: files are never read — a stale data_dir must not fail
    stale = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_dir=str(tmp_path / "nope"))
    )
    assert stale.data.source == "synthetic"
    r = doctor._data_dir(stale)
    assert r["ok"] and "reads no files" in r["skipped"]

    # file source + missing dir -> not ok
    bad = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, source="tfrecord_native", data_dir=str(tmp_path / "nope")
        ),
    )
    r = doctor._data_dir(bad)
    assert not r["ok"] and "no TFRecord files" in r["error"]

    # file source with data_dir unset -> explicit error
    unset = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, source="tfrecord_native", data_dir=None),
    )
    r = doctor._data_dir(unset)
    assert not r["ok"] and "data.data_dir unset" in r["error"]

    # real fixture -> schema reported
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        write_clips_tfrecord_native,
    )

    rng = np.random.RandomState(0)
    write_clips_tfrecord_native(
        str(tmp_path / "c.tfrecord"),
        rng.randint(0, 256, size=(2, 4, 8, 8, 3), dtype=np.uint8),
        rng.randn(2, 4, 4).astype(np.float32),
        rng.randn(2, 4, 3).astype(np.float32),
    )
    good = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            source="tfrecord_native",
            data_dir=str(tmp_path),
            clip_len=4,
            raw_image_size=8,
        ),
    )
    r = doctor._data_dir(good)
    assert r["ok"], r
    assert r["first_clip"]["frames"] == [4, 8, 8, 3]


def test_cli_doctor_end_to_end(tmp_path, capsys, monkeypatch):
    # Patch the slow informational TF-import subprocess; everything else
    # (device probe, native lib, data/checkpoint checks) runs for real.
    monkeypatch.setattr(doctor, "_start_tf_check", lambda: None)
    monkeypatch.setattr(
        doctor,
        "_collect_tf_check",
        lambda proc, timeout: {"ok": True, "version": "patched"},
    )
    from action_conditioned_gans_tpu import cli

    rc = cli.main(
        [
            "doctor",
            "--platform",
            "cpu",
            "--probe-timeout",
            "300",
            "--workdir",
            str(tmp_path),
        ]
    )
    report = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert report["ok"] and report["device"]["ok"] and report["native_lib"]["ok"]
    assert report["checkpoints"]["skipped"].startswith("no checkpoint dir")


def test_eval_data_dir_check(tmp_path):
    cfg = get_preset("config1")
    # Unset -> informational skip naming the fallback, never a failure.
    syn = doctor._eval_data_dir(cfg)
    assert syn["ok"] and "reads no files" in syn["skipped"]
    file_cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, source="tfrecord_native", data_dir=str(tmp_path)
        ),
    )
    r = doctor._eval_data_dir(file_cfg)
    assert r["ok"] and "eval_data_dir unset" in r["skipped"]

    # Set but empty -> a real failure (an honest-eval run would crash).
    bad = dataclasses.replace(
        file_cfg,
        data=dataclasses.replace(
            file_cfg.data, eval_data_dir=str(tmp_path / "nope")
        ),
    )
    r = doctor._eval_data_dir(bad)
    assert not r["ok"] and "no TFRecord files" in r["error"]


def test_checkpoints_gate_states(tmp_path):
    """ADVICE r3 + r4 review: foreign/corrupt checkpoint contents must fail
    the gate, but an EMPTY dir is the normal fresh-run state
    (CheckpointManager mkdirs it eagerly at train startup) and must stay
    healthy — otherwise every pre-first-checkpoint run flunks doctor."""
    cfg = dataclasses.replace(get_preset("config1"), workdir=str(tmp_path))
    # No dir at all: skipped, healthy.
    r = doctor._checkpoints(cfg)
    assert r["ok"] and "no checkpoint dir" in r["skipped"]
    # Empty dir (fresh run, pre-first-checkpoint): healthy with a note.
    (tmp_path / "checkpoints").mkdir()
    r = doctor._checkpoints(cfg)
    assert r["ok"] and "fresh run" in r["note"]
    # orbax async-save tmp dirs only: healthy (save in flight).
    tmp_save = tmp_path / "checkpoints" / "512.orbax-checkpoint-tmp-17"
    tmp_save.mkdir()
    r = doctor._checkpoints(cfg)
    assert r["ok"] and "in progress" in r["note"]
    tmp_save.rmdir()
    # Non-empty with no numeric step dirs: failure.
    (tmp_path / "checkpoints" / "not-a-step").mkdir()
    r = doctor._checkpoints(cfg)
    assert not r["ok"] and "no numeric step" in r["error"]
    # A restorable step: healthy again.
    (tmp_path / "checkpoints" / "100").mkdir()
    r = doctor._checkpoints(cfg)
    assert r["ok"] and r["latest"] == 100

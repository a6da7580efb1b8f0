"""Preemption handling (SURVEY.md §6): SIGTERM mid-training checkpoints and
exits cleanly; the next run resumes from that checkpoint."""

import os
import signal
import threading

import numpy as np

from action_conditioned_gans_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.train.loop import train


def tiny_config(workdir: str) -> Config:
    return Config(
        name="tiny-preempt",
        model=ModelConfig(
            image_size=16,
            g_levels=2,
            g_base_channels=8,
            d_levels=2,
            d_base_channels=8,
            group_norm_groups=4,
            compute_dtype="float32",
        ),
        data=DataConfig(seq_len=2),
        train=TrainConfig(
            batch_size=2,
            total_steps=10_000,  # far more than we'll run before SIGTERM
            log_every=10_000,
            checkpoint_every=10_000,
            sample_every=0,
        ),
        mesh=MeshConfig(data=1),
        workdir=workdir,
    )


def test_sigterm_checkpoints_and_resumes(tmp_path, monkeypatch):
    cfg = tiny_config(str(tmp_path))

    # Deliver SIGTERM right after the FIRST training step completes (hooking
    # the per-step MetricWriter.tick) — a fixed timer could fire during
    # compilation, before train() installs its handler.
    from action_conditioned_gans_tpu.utils.metrics import MetricWriter

    orig_tick = MetricWriter.tick
    fired = {"done": False}

    def tick_and_kill(self):
        orig_tick(self)
        if not fired["done"]:
            fired["done"] = True
            threading.Timer(0.05, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()

    monkeypatch.setattr(MetricWriter, "tick", tick_and_kill)
    state = train(cfg, max_steps=10_000)

    stopped_at = int(np.asarray(state.step))
    assert 0 < stopped_at < 10_000, "SIGTERM should stop training early"
    ckpts = os.listdir(tmp_path / "checkpoints")
    assert any(c.isdigit() and int(c) == stopped_at for c in ckpts)

    # Resume picks up from the preemption checkpoint.
    state2 = train(cfg, max_steps=stopped_at + 2)
    assert int(np.asarray(state2.step)) == stopped_at + 2


def test_sigkill_crash_resumes_from_latest_checkpoint(tmp_path):
    """Hard crash (SIGKILL — no handler can run, unlike the SIGTERM path):
    orbax checkpoints already on disk must stay loadable and a fresh run
    must resume from the latest one rather than restarting from step 0
    (SURVEY.md §6 failure-detection row: restart-from-latest on failure)."""
    import signal as _signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = f"""
import sys
sys.path.insert(0, {repo!r})
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
from tests.test_preemption import tiny_config
from action_conditioned_gans_tpu.train.loop import train
import dataclasses
cfg = tiny_config({str(tmp_path)!r})
cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, checkpoint_every=5, log_every=5))
train(cfg, max_steps=10_000)
"""
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # Wait for at least one checkpoint to land, then SIGKILL mid-flight.
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    deadline = time.time() + 300
    seen = False
    while time.time() < deadline:
        if os.path.isdir(ckpt_dir) and any(
            d.isdigit() for d in os.listdir(ckpt_dir)
        ):
            seen = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.25)
    assert seen, f"no checkpoint appeared before the worker exited: {proc.stdout.read() if proc.poll() is not None else 'still running'}"
    time.sleep(0.5)  # let it advance past the checkpoint
    proc.send_signal(_signal.SIGKILL)
    proc.wait(timeout=60)
    assert proc.returncode == -_signal.SIGKILL

    # The latest checkpoint written before the kill must restore intact...
    from action_conditioned_gans_tpu.train.state import init_state, restore_state
    from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config(str(tmp_path))
    mgr = CheckpointManager(ckpt_dir)
    latest = mgr.latest_step()
    assert latest is not None and latest > 0
    import jax

    restored = restore_state(cfg, mgr, template=init_state(cfg, jax.random.PRNGKey(0)))
    mgr.close()
    assert int(np.asarray(restored.step)) == latest

    # ...and a fresh training run must RESUME from it, not restart at 0.
    from action_conditioned_gans_tpu.train.loop import train as train2

    state = train2(cfg, max_steps=latest + 4, resume=True)
    assert int(np.asarray(state.step)) >= latest + 4 > latest

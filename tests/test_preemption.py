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

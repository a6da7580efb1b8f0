"""End-to-end smoke (SURVEY.md §5.6): the full train loop runs on the CPU
mesh, losses stay finite, checkpoints land, resume continues the step
counter, and sampling writes images."""

import dataclasses
import json
import os

import numpy as np

from action_conditioned_gans_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.train.loop import train
from action_conditioned_gans_tpu.train.sample import sample


def tiny_config(workdir: str) -> Config:
    return Config(
        name="tiny-e2e",
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
            batch_size=8,
            total_steps=4,
            log_every=2,
            checkpoint_every=2,
            checkpoint_keep=2,
            sample_every=3,  # exercises in-training held-out sampling
        ),
        mesh=MeshConfig(data=-1),  # all 8 virtual devices
        workdir=workdir,
    )


def test_train_smoke_and_resume(tmp_path, capsys):
    cfg = tiny_config(str(tmp_path))
    state = train(cfg, max_steps=3)
    assert int(np.asarray(state.step)) == 3
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints"))

    # Logged metrics were finite JSON lines, including the periodic
    # held-out eval triggered by sample_every.
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert lines and all(np.isfinite(l["g_loss"]) for l in lines if "g_loss" in l)
    assert any("eval_psnr" in l for l in lines)

    # Resume continues from the saved step.
    state2 = train(cfg, max_steps=5)
    assert int(np.asarray(state2.step)) == 5

    # Sampling writes grids/GIFs and returns finite eval metrics.
    metrics = sample(cfg, state2, str(tmp_path / "samples"), num_clips=2, horizon=2)
    assert np.isfinite(metrics["eval_psnr"])
    assert os.path.exists(tmp_path / "samples" / "pred_final_frame.png")
    assert os.path.exists(tmp_path / "samples" / "rollout_0.gif")


def test_train_with_steps_per_call(tmp_path):
    """Multi-step dispatch through the full loop: step counting, logging and
    checkpoint cadence stay correct."""
    import dataclasses

    cfg = tiny_config(str(tmp_path))
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, steps_per_call=2, total_steps=6, checkpoint_every=4, sample_every=0
        ),
    )
    state = train(cfg, max_steps=6)
    assert int(np.asarray(state.step)) == 6
    # resumed run continues in units of k
    state2 = train(cfg, max_steps=8)
    assert int(np.asarray(state2.step)) == 8


def test_in_training_eval_logs_ema_scalars_iff_ema_on(tmp_path, capsys):
    """VERDICT r2 weak 5: when ema_decay > 0 the periodic held-out eval must
    log eval_*_ema (the served weights' trend) alongside the raw-param
    scalars; with EMA off the _ema scalars must not appear."""
    for ema, sub in ((0.9, "ema"), (0.0, "plain")):
        cfg = tiny_config(str(tmp_path / sub))
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, ema_decay=ema, sample_every=2, total_steps=2
            ),
        )
        train(cfg, max_steps=2)
        lines = [
            json.loads(l)
            for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")
        ]
        has_eval = [l for l in lines if "eval_psnr" in l]
        assert has_eval, "periodic eval did not fire"
        if ema > 0:
            assert all("eval_psnr_ema" in l for l in has_eval)
            assert all(np.isfinite(l["eval_psnr_ema"]) for l in has_eval)
        else:
            assert all("eval_psnr_ema" not in l for l in has_eval)


def test_profile_capture_writes_xplane_even_when_run_is_short(tmp_path, capsys):
    """--profile-steps on a run SHORTER than the 3-dispatch warmup must
    still capture a trace (r5: config3's steps_per_call=32 with --steps 40
    silently wrote nothing) — the warmup is clamped, the window is flushed
    at loop exit if it extends past total, and an xplane.pb lands under
    <workdir>/profile for `acgan profile-report`."""
    import glob

    cfg = tiny_config(str(tmp_path))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_call=4)
    )
    # total=8 < 3*k=12 warmup: old code never started the trace; the
    # profile_stop (4+8=12) also lands past total, exercising the flush.
    train(cfg, max_steps=8, profile_steps=8, workdir=str(tmp_path))
    out = capsys.readouterr().out
    assert "profile warmup clamped" in out
    assert "trace captured" in out
    pbs = glob.glob(os.path.join(str(tmp_path), "profile", "**", "*.xplane.pb"), recursive=True)
    assert pbs, "no xplane.pb written under <workdir>/profile"

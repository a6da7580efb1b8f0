"""CLI / config tests."""

import pytest

from action_conditioned_gans_tpu.cli import apply_overrides, build_parser, main
from action_conditioned_gans_tpu.config import PRESETS, get_preset


def test_presets_cover_baseline_configs():
    # The five BASELINE.json benchmark configs, by construction.
    assert set(PRESETS) == {f"config{i}" for i in range(1, 6)}
    c1 = get_preset("config1")
    assert (c1.model.image_size, c1.train.batch_size, c1.train.rollout_length) == (64, 8, 1)
    c2 = get_preset("config2")
    assert (c2.train.rollout_length, c2.train.batch_size) == (10, 16)
    c3 = get_preset("config3")
    assert (c3.model.image_size, c3.train.batch_size, c3.model.d_extra_layers) == (128, 32, 1)
    c4 = get_preset("config4")
    assert (c4.model.state_dim, c4.train.scheduled_sampling, c4.train.batch_size) == (3, True, 64)
    c5 = get_preset("config5")
    assert (c5.model.image_size, c5.train.rollout_length) == (256, 30)


def test_get_preset_unknown():
    with pytest.raises(KeyError):
        get_preset("nope")


def test_apply_overrides():
    cfg = get_preset("config1")
    cfg = apply_overrides(
        cfg,
        [
            "train.batch_size=16",
            "model.image_size=128",
            "train.scheduled_sampling=true",
            "workdir=/tmp/x",
        ],
    )
    assert cfg.train.batch_size == 16
    assert cfg.model.image_size == 128
    assert cfg.train.scheduled_sampling is True
    assert cfg.workdir == "/tmp/x"


def test_apply_overrides_rejects_bad_key():
    cfg = get_preset("config1")
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["train.batch_size"])


def test_cli_configs_command(capsys):
    assert main(["configs"]) == 0
    out = capsys.readouterr().out
    assert "config1" in out and "config5" in out


def test_parser_accepts_all_commands():
    p = build_parser()
    for cmd in ("train", "sample", "eval", "bench", "configs"):
        assert p.parse_args([cmd]).command == cmd


def test_cli_sample_end_to_end(tmp_path, capsys):
    """Drive `sample` through main() against a saved checkpoint — including
    the lenient raw load of an EMA-carrying checkpoint and the --ema path
    (an UnboundLocalError in this code path once passed the suite because
    nothing drove the sample command)."""
    import jax

    from action_conditioned_gans_tpu.train.state import init_state
    from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager

    overrides = [
        "--set", "model.image_size=16", "--set", "model.g_levels=2",
        "--set", "model.g_base_channels=8", "--set", "model.d_levels=2",
        "--set", "model.d_base_channels=8", "--set", "model.group_norm_groups=4",
        "--set", "model.compute_dtype=float32", "--set", "train.batch_size=2",
    ]
    train_overrides = overrides + ["--set", "train.ema_decay=0.9"]
    from action_conditioned_gans_tpu.cli import apply_overrides

    # Save a checkpoint WITH an EMA tree (as an ema_decay training run would).
    from action_conditioned_gans_tpu.config import get_preset

    cfg = apply_overrides(
        get_preset("config1", workdir=str(tmp_path)), [o for o in train_overrides if o != "--set"]
    )
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(f"{tmp_path}/checkpoints")
    mgr.save(3, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    base = ["sample", "--preset", "config1", "--workdir", str(tmp_path),
            "--num-clips", "2"] + overrides
    # Raw sample of the EMA checkpoint under a PLAIN config (lenient restore).
    assert main(base) == 0
    out1 = capsys.readouterr().out
    assert "eval_l2" in out1
    # --ema path (template force-widened).
    assert main(base + ["--ema"]) == 0
    out2 = capsys.readouterr().out
    assert "eval_l2" in out2


def test_cli_ema_on_plain_checkpoint_errors_cleanly(tmp_path, capsys):
    """--ema against a checkpoint WITHOUT EMA weights exits with the
    friendly argparse error (a NameError on an undefined parser variable
    once lurked in this path)."""
    import jax

    from action_conditioned_gans_tpu.config import get_preset
    from action_conditioned_gans_tpu.cli import apply_overrides
    from action_conditioned_gans_tpu.train.state import init_state
    from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager

    overrides = [
        "model.image_size=16", "model.g_levels=2", "model.g_base_channels=8",
        "model.d_levels=2", "model.d_base_channels=8",
        "model.group_norm_groups=4", "model.compute_dtype=float32",
        "train.batch_size=2",
    ]
    cfg = apply_overrides(get_preset("config1", workdir=str(tmp_path)), overrides)
    assert cfg.train.ema_decay == 0.0
    mgr = CheckpointManager(f"{tmp_path}/checkpoints")
    mgr.save(1, jax.device_get(init_state(cfg, jax.random.PRNGKey(0))), force=True)
    mgr.wait()
    mgr.close()

    argv = ["sample", "--preset", "config1", "--workdir", str(tmp_path), "--ema"]
    for o in overrides:
        argv += ["--set", o]
    with pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code == 2  # argparse .error(), not a NameError
    assert "ema_decay" in capsys.readouterr().err


def test_cli_ema_without_checkpoint_errors(tmp_path, capsys):
    """--ema with NO checkpoint on disk must error (ADVICE r2: it used to
    warn 'sampling from init' and then silently serve untrained weights —
    the forced ema_decay seeds g_ema from the init params)."""
    argv = [
        "sample", "--preset", "config1", "--workdir", str(tmp_path / "empty"),
        "--ema", "--set", "model.image_size=16", "--set", "model.g_levels=2",
        "--set", "model.d_levels=2", "--set", "model.compute_dtype=float32",
    ]
    with pytest.raises(SystemExit) as exc:
        main(argv)
    assert exc.value.code == 2
    assert "checkpoint" in capsys.readouterr().err

"""Learning-rate schedules + gradient clipping (TrainConfig.lr_schedule /
warmup_steps / lr_decay_steps / lr_end_factor / grad_clip_norm).

The default ("constant", no warmup, no clip) must keep the optimizer-state
pytree bit-identical to plain float-lr Adam — checkpoints and TP shardings
depend on that layout — so the tests pin structure equality as well as the
schedule math.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from action_conditioned_gans_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from action_conditioned_gans_tpu.data import generate_clips
from action_conditioned_gans_tpu.train import init_state, make_optimizers
from action_conditioned_gans_tpu.train.state import make_lr_schedule
from action_conditioned_gans_tpu.train.step import jit_train_step


def tiny_config(**train_kw) -> Config:
    train_kw.setdefault("batch_size", 2)
    train_kw.setdefault("recon_weight", 10.0)
    return Config(
        name="tiny",
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
        train=TrainConfig(**train_kw),
    )


def make_batch(cfg: Config, seed=0):
    t = cfg.train
    return generate_clips(
        jax.random.PRNGKey(seed),
        t.batch_size,
        t.rollout_length + 1,
        cfg.model.image_size,
        cfg.model.action_dim,
    )


# -- schedule math ------------------------------------------------------------


def test_constant_no_warmup_is_plain_float():
    t = TrainConfig()
    assert make_lr_schedule(t, 2e-4) == 2e-4  # a float, not a callable


def test_warmup_then_constant():
    t = TrainConfig(warmup_steps=10, total_steps=100)
    sched = make_lr_schedule(t, 1.0)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(99)) == pytest.approx(1.0)


def test_linear_decay_holds_at_floor():
    t = TrainConfig(
        lr_schedule="linear",
        warmup_steps=10,
        lr_decay_steps=80,
        lr_end_factor=0.1,
        total_steps=1000,
    )
    sched = make_lr_schedule(t, 1.0)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(50)) == pytest.approx(1.0 - 0.9 * 40 / 80)
    assert float(sched(90)) == pytest.approx(0.1)
    # Past warmup + decay the floor HOLDS (training may run longer).
    assert float(sched(500)) == pytest.approx(0.1)


def test_cosine_decay_endpoints():
    t = TrainConfig(lr_schedule="cosine", lr_decay_steps=100, lr_end_factor=0.05)
    sched = make_lr_schedule(t, 2.0)
    assert float(sched(0)) == pytest.approx(2.0)
    # Midpoint of the half-cosine: (1 + alpha) / 2 of peak.
    assert float(sched(50)) == pytest.approx(2.0 * (1 + 0.05) / 2, rel=1e-6)
    assert float(sched(100)) == pytest.approx(0.1, rel=1e-6)
    assert float(sched(400)) == pytest.approx(0.1, rel=1e-6)


def test_decay_steps_default_to_total_minus_warmup():
    t = TrainConfig(
        lr_schedule="linear", warmup_steps=10, total_steps=110, lr_end_factor=0.0
    )
    sched = make_lr_schedule(t, 1.0)
    assert float(sched(60)) == pytest.approx(0.5)  # halfway through 100
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-7)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError, match="lr_schedule"):
        make_lr_schedule(TrainConfig(lr_schedule="step"), 1.0)


# -- optimizer-state layout contracts ----------------------------------------


def _opt_structs(cfg):
    g_tx, _ = make_optimizers(cfg)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    return jax.tree_util.tree_structure(g_tx.init(params)), g_tx, params


def test_default_layout_matches_stock_adam():
    cfg = tiny_config()
    struct, _, params = _opt_structs(cfg)
    stock = optax.adam(cfg.train.g_lr, b1=0.5, b2=0.999)
    assert struct == jax.tree_util.tree_structure(stock.init(params))


def test_bf16_constant_layout_unchanged_by_lr_refactor():
    # scale_by_learning_rate(float) must degrade to scale(-lr): same state
    # pytree as the pre-schedule code, so bf16-moment checkpoints restore.
    cfg = tiny_config(adam_moment_dtype="bfloat16")
    struct, _, params = _opt_structs(cfg)
    from action_conditioned_gans_tpu.train.state import scale_by_adam_moment_dtype

    legacy = optax.chain(
        scale_by_adam_moment_dtype(0.5, 0.999, 1e-8, jnp.bfloat16),
        optax.scale(-cfg.train.g_lr),
    )
    assert struct == jax.tree_util.tree_structure(legacy.init(params))


def test_clip_equivalent_to_manual_clip_then_adam():
    cfg = tiny_config(grad_clip_norm=1.0)
    _, g_tx, params = _opt_structs(cfg)
    grads = {"w": jnp.full((4, 3), 50.0), "b": jnp.full((3,), -30.0)}
    upd, _ = g_tx.update(grads, g_tx.init(params), params)

    gnorm = float(optax.global_norm(grads))
    clipped = jax.tree_util.tree_map(lambda g: g / gnorm, grads)
    stock = optax.adam(cfg.train.g_lr, b1=0.5, b2=0.999)
    ref_upd, _ = stock.update(clipped, stock.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(upd), jax.tree_util.tree_leaves(ref_upd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


# -- through the real fused train step ----------------------------------------


def test_warmup_first_step_is_identity_then_moves():
    cfg = tiny_config(warmup_steps=5, total_steps=100)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    batch = make_batch(cfg)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.g_params)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    # lr(count=0) == 0: moments updated, parameters bit-unchanged.
    for a, b in zip(
        jax.tree_util.tree_leaves(before),
        jax.tree_util.tree_leaves(state.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, m = step(state, batch, jax.random.PRNGKey(2))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(before),
            jax.tree_util.tree_leaves(state.g_params),
        )
    )
    assert moved
    assert all(np.isfinite(float(v)) for v in m.values())


def test_grad_norm_metrics_opt_in():
    cfg = tiny_config(log_grad_norms=True)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert float(m["g_grad_norm"]) > 0 and np.isfinite(float(m["g_grad_norm"]))
    assert float(m["d_grad_norm"]) > 0 and np.isfinite(float(m["d_grad_norm"]))
    # Off by default: the metric keys don't exist (cadence files stay lean).
    cfg2 = tiny_config()
    state2 = init_state(cfg2, jax.random.PRNGKey(0))
    _, m2 = jit_train_step(cfg2)(state2, make_batch(cfg2), jax.random.PRNGKey(1))
    assert "g_grad_norm" not in m2


def test_effective_lr_in_log_lines(tmp_path, capsys):
    """With a schedule active, each metric log line carries the host-side
    effective g_lr/d_lr; with the constant default the keys are absent."""
    import json as _json

    from action_conditioned_gans_tpu.cli import main

    args = [
        "train", "--preset", "config1", "--workdir", str(tmp_path),
        "--steps", "2",
    ]
    for o in (
        "model.image_size=16", "model.g_levels=2", "model.g_base_channels=8",
        "model.d_levels=2", "model.d_base_channels=8",
        "model.group_norm_groups=4", "model.compute_dtype=float32",
        "train.batch_size=8", "train.steps_per_call=1", "train.log_every=1",
        "train.warmup_steps=4", "train.total_steps=100",
        "data.source=synthetic",
    ):
        args += ["--set", o]
    assert main(args) == 0
    records = [
        _json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{") and '"g_lr"' in line
    ]
    by_step = {r["step"]: r for r in records}
    # Step 1 logged lr(count=0) = 0 (warmup start); step 2 = peak * 1/4.
    assert by_step[1]["g_lr"] == pytest.approx(0.0)
    assert by_step[2]["g_lr"] == pytest.approx(2e-4 / 4)
    assert by_step[2]["d_lr"] == pytest.approx(2e-4 / 4)


def test_clip_and_schedule_train_and_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(
        lr_schedule="cosine",
        warmup_steps=2,
        lr_decay_steps=50,
        grad_clip_norm=1.0,
        checkpoint_every=2,
    )
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    batch = make_batch(cfg)
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    assert int(state.step) == 3
    assert all(np.isfinite(float(v)) for v in m.values())

    # The schedule's step counter must survive save/restore (it lives in
    # the optimizer state, orbax round-trips it like any other leaf).
    from action_conditioned_gans_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    from action_conditioned_gans_tpu.train.state import restore_state

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(3, state, force=True)
    mgr.wait()
    restored = restore_state(cfg, mgr)
    for a, b in zip(
        jax.tree_util.tree_leaves(state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_d_schedule_horizons_scale_with_disc_steps():
    """D's optax counter ticks disc_steps times per train step, so its
    schedule horizons scale by disc_steps — warmup_steps always means
    TRAIN steps for both optimizers."""
    t = TrainConfig(warmup_steps=10, total_steps=100, disc_steps=2)
    d_sched = make_lr_schedule(t, 1.0, updates_per_step=t.disc_steps)
    # After 1 train step = 2 D updates: warmup fraction 2/20.
    assert float(d_sched(2)) == pytest.approx(0.1)
    assert float(d_sched(20)) == pytest.approx(1.0)  # warmup ends at step 10
    g_sched = make_lr_schedule(t, 1.0)
    assert float(g_sched(10)) == pytest.approx(1.0)


def test_lr_value_matches_optax_schedule():
    """The host loop's pure-Python lr_value mirrors the optax schedule
    exactly (it must never touch the device — platform rule 6)."""
    from action_conditioned_gans_tpu.train.state import lr_value

    for kind in ("constant", "linear", "cosine"):
        for warmup in (0, 7):
            t = TrainConfig(
                lr_schedule=kind,
                warmup_steps=warmup,
                lr_decay_steps=40,
                lr_end_factor=0.07,
                total_steps=200,
            )
            sched = make_lr_schedule(t, 3e-4)
            for count in (0, 1, 6, 7, 20, 47, 46, 48, 100, 199):
                want = (
                    sched if isinstance(sched, float) else float(sched(count))
                )
                got = lr_value(t, 3e-4, count)
                assert got == pytest.approx(want, rel=1e-6, abs=1e-12), (
                    kind, warmup, count)

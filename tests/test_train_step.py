"""Train-step property tests (SURVEY.md §5.3): the fused G+D update trains,
keeps G/D gradient flows disjoint, and supports rollouts + scheduled
sampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.data import generate_clips
from action_conditioned_gans_tpu.train import init_state, make_train_step
from action_conditioned_gans_tpu.train.rollout import scheduled_sampling_prob
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


def test_single_step_updates_and_finite_losses():
    cfg = tiny_config()
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    batch = make_batch(cfg)
    g_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.g_params)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # Both parameter sets actually moved.
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.g_params, g_before
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_recon_loss_decreases_over_steps():
    cfg = tiny_config()
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    recons = []
    for i in range(12):
        state, metrics = step(state, make_batch(cfg, seed=i % 3), jax.random.PRNGKey(i))
        recons.append(float(metrics["g_recon"]))
    # With recon_weight >> adv, reconstruction must trend down.
    assert np.mean(recons[-3:]) < np.mean(recons[:3])


def test_gradient_flows_disjoint():
    """G grads don't touch D params and vice versa (SURVEY.md §5.3)."""
    cfg = tiny_config()
    state = init_state(cfg, jax.random.PRNGKey(0))
    from action_conditioned_gans_tpu.train.step import make_train_step

    base = make_train_step(cfg)
    batch = make_batch(cfg)

    # Perturb D params -> G's Adam first-moment direction may change, but the
    # structural check is simpler: the step function treats g_params/d_params
    # as separate pytrees with separate optimizers. Verify the D update is
    # independent of the G optimizer state and vice versa by checking the two
    # optimizer states track their own param trees.
    new_state, _ = jax.jit(base)(state, batch, jax.random.PRNGKey(1))
    g_shapes = jax.tree_util.tree_structure(new_state.g_params)
    d_shapes = jax.tree_util.tree_structure(new_state.d_params)
    assert jax.tree_util.tree_structure(new_state.g_opt[0].mu) == g_shapes
    assert jax.tree_util.tree_structure(new_state.d_opt[0].mu) == d_shapes


@pytest.mark.parametrize("recon_type", ["l1", "l2"])
def test_recon_types(recon_type):
    cfg = tiny_config(recon_type=recon_type)
    state = init_state(cfg, jax.random.PRNGKey(0))
    state, metrics = jit_train_step(cfg)(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_recon"]))


def test_rollout_training_step():
    cfg = tiny_config(rollout_length=3, batch_size=2)
    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    assert batch["frames"].shape[1] == 4
    state, metrics = jit_train_step(cfg)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))


def test_scheduled_sampling_prob_anneals():
    t = TrainConfig(
        scheduled_sampling=True, ss_start_prob=0.0, ss_end_prob=1.0, ss_decay_steps=100
    )
    p0 = float(scheduled_sampling_prob(jnp.asarray(0), t))
    p50 = float(scheduled_sampling_prob(jnp.asarray(50), t))
    p200 = float(scheduled_sampling_prob(jnp.asarray(200), t))
    assert p0 == 0.0 and abs(p50 - 0.5) < 1e-6 and p200 == 1.0
    t_off = TrainConfig(scheduled_sampling=False)
    assert float(scheduled_sampling_prob(jnp.asarray(999), t_off)) == 0.0


def test_state_conditioned_training():
    cfg = tiny_config(rollout_length=2)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, state_dim=3))
    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    assert "states" in batch
    state, metrics = jit_train_step(cfg)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))


def test_steps_per_call_equivalence():
    """k scanned steps per dispatch == k sequential single-step dispatches."""
    import jax.numpy as jnp

    from action_conditioned_gans_tpu.train.step import make_multi_train_step, stack_batches

    cfg1 = tiny_config()
    cfg2 = tiny_config(steps_per_call=2)
    rng = jax.random.PRNGKey(1)
    b0, b1 = make_batch(cfg1, seed=0), make_batch(cfg1, seed=1)

    s_seq = init_state(cfg1, jax.random.PRNGKey(0))
    step1 = jit_train_step(cfg1)
    s_seq, _ = step1(s_seq, b0, rng)
    s_seq, m_seq = step1(s_seq, b1, rng)

    s_multi = init_state(cfg2, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), b0, b1
    )
    multi = jax.jit(make_multi_train_step(cfg2))
    s_multi, m_multi = multi(s_multi, stacked, rng)

    assert int(s_multi.step) == int(s_seq.step) == 2
    np.testing.assert_allclose(float(m_seq["g_loss"]), float(m_multi["g_loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_seq.g_params),
        jax.tree_util.tree_leaves(s_multi.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scan_unroll_equivalence():
    """train.scan_unroll=2 is a pure scheduling hint: bit-identical states
    and metrics to the rolled scan at the same steps_per_call."""
    import jax.numpy as jnp

    from action_conditioned_gans_tpu.train.step import make_multi_train_step, stack_batches

    rng = jax.random.PRNGKey(1)
    cfg_r = tiny_config(steps_per_call=4)
    cfg_u = tiny_config(steps_per_call=4, scan_unroll=2)
    batches = [make_batch(cfg_r, seed=i) for i in range(4)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    outs = []
    for cfg in (cfg_r, cfg_u):
        s = init_state(cfg, jax.random.PRNGKey(0))
        s, m = jax.jit(make_multi_train_step(cfg))(s, stacked, rng)
        outs.append((s, m))
    (s_r, m_r), (s_u, m_u) = outs
    assert int(s_r.step) == int(s_u.step) == 4
    np.testing.assert_allclose(float(m_r["g_loss"]), float(m_u["g_loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_r.g_params),
        jax.tree_util.tree_leaves(s_u.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_stack_batches_shape():
    from action_conditioned_gans_tpu.train.step import stack_batches

    cfg = tiny_config(batch_size=4)
    batch = make_batch(cfg)
    stacked = stack_batches(batch, 2)
    assert stacked["frames"].shape[:2] == (2, 2)


def test_disc_steps_k():
    cfg = tiny_config(disc_steps=2)
    state = init_state(cfg, jax.random.PRNGKey(0))
    state, metrics = jit_train_step(cfg)(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["d_loss"]))


@pytest.mark.parametrize("ss", [False, True])
def test_single_forward_vjp_matches_two_forward_reference(ss):
    """The fused step computes ONE generator rollout (jax.vjp) and chains the
    loss-head cotangent through it. Pin that against the straightforward
    two-forward formulation (predict for D, predict again inside G's
    value_and_grad) — the math must be identical for both teacher-forced and
    scheduled-sampling rollouts."""
    from jax import lax

    from action_conditioned_gans_tpu.models import Discriminator, Generator
    from action_conditioned_gans_tpu.train import losses as L
    from action_conditioned_gans_tpu.train.rollout import (
        rollout_generator,
        rollout_teacher_forced,
    )
    from action_conditioned_gans_tpu.train.state import TrainState, make_optimizers

    cfg = tiny_config(
        rollout_length=3,
        scheduled_sampling=ss,
        ss_start_prob=0.5 if ss else 0.0,
        ss_end_prob=0.5 if ss else 1.0,
    )
    m, t = cfg.model, cfg.train
    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(7)

    # jit_train_step donates its state argument — run it on a copy so the
    # manual reference below can still read the original buffers.
    state_copy = jax.tree_util.tree_map(jnp.copy, state)
    got, _ = jit_train_step(cfg)(state_copy, batch, rng)

    # --- Reference: same semantics, generator rollout computed twice.
    gen, disc = Generator(m), Discriminator(m)
    g_tx, d_tx = make_optimizers(cfg)
    frames, actions = batch["frames"], batch["actions"]
    horizon = actions.shape[1]

    def fold(x):
        return x.reshape((-1,) + x.shape[2:])

    def g_apply(p, fr, ac, st):
        return gen.apply({"params": p}, fr, ac, st)

    def d_apply(p, nxt, fr, ac):
        return disc.apply({"params": p}, nxt, fr, ac, None)

    r = jax.random.fold_in(rng, state.step)
    ss_prob = scheduled_sampling_prob(state.step, t)
    r, gkey = jax.random.split(r)

    def predict(g_params):
        if not t.scheduled_sampling:
            return rollout_teacher_forced(
                g_apply, g_params, frames, actions, None,
                time_chunk=t.rollout_time_chunk, remat=t.remat_rollout,
            )
        return rollout_generator(
            g_apply, g_params, frames, actions, None, gkey, ss_prob,
            remat=t.remat_rollout,
        )

    cond = fold(frames[:, :horizon])
    real_next = fold(frames[:, 1:])
    flat_act = fold(actions)
    fake_for_d = lax.stop_gradient(fold(predict(state.g_params)))

    def d_loss_fn(d_params):
        both = jnp.concatenate([real_next, fake_for_d], axis=0)
        two = lambda x: jnp.concatenate([x, x], axis=0)
        logits = d_apply(d_params, both, two(cond), two(flat_act))
        rl, fl = jnp.split(logits, 2, axis=0)
        return L.discriminator_loss(rl, fl)

    d_grads = jax.grad(d_loss_fn)(state.d_params)
    d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
    d_params = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), state.d_params, d_updates
    )

    def g_loss_fn(g_params):
        preds = fold(predict(g_params))
        adv = L.generator_adv_loss(d_apply(d_params, preds, cond, flat_act))
        return adv + t.recon_weight * L.reconstruction_loss(
            preds, real_next, t.recon_type
        )

    g_grads = jax.grad(g_loss_fn)(state.g_params)
    g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
    g_params = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), state.g_params, g_updates
    )
    want = TrainState(step=state.step + 1, g_params=g_params, d_params=d_params,
                      g_opt=g_opt, d_opt=d_opt)

    for name, a, b in zip(
        ("g", "d"),
        (got.g_params, got.d_params),
        (want.g_params, want.d_params),
    ):
        for ga, gb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), atol=5e-6, rtol=1e-4,
                err_msg=f"{name} params diverged from two-forward reference",
            )


def test_flatten_optimizer_updates_identical():
    """optax.flatten (one fused Adam over the concatenated parameter vector)
    is elementwise-identical to the per-tensor layout — same params after a
    step (up to one-ULP compilation differences in the fused rsqrt)."""
    cfg_flat = tiny_config(flatten_optimizer=True)
    cfg_tree = tiny_config(flatten_optimizer=False)
    batch = make_batch(cfg_flat)
    rng = jax.random.PRNGKey(1)
    a, _ = jit_train_step(cfg_flat)(init_state(cfg_flat, jax.random.PRNGKey(0)), batch, rng)
    b, _ = jit_train_step(cfg_tree)(init_state(cfg_tree, jax.random.PRNGKey(0)), batch, rng)
    for pa, pb in zip(
        jax.tree_util.tree_leaves((a.g_params, a.d_params)),
        jax.tree_util.tree_leaves((b.g_params, b.d_params)),
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-9, rtol=1e-6)


@pytest.mark.parametrize("state_dim", [0, 3])
def test_disc_microbatch_equivalence(state_dim):
    """disc_microbatch chunks the D loss/grad and G's loss head over the
    folded transition axis with gradient accumulation — identical updates to
    the full-batch path (per-sample-mean losses over equal chunks)."""
    def cfg_with(mb):
        c = tiny_config(rollout_length=4, batch_size=2, disc_microbatch=mb)
        if state_dim:
            c = dataclasses.replace(c, model=dataclasses.replace(c.model, state_dim=state_dim))
        return c

    batch = make_batch(cfg_with(0))
    rng = jax.random.PRNGKey(3)
    full, m_full = jit_train_step(cfg_with(0))(
        init_state(cfg_with(0), jax.random.PRNGKey(0)), batch, rng
    )
    chunked, m_chunk = jit_train_step(cfg_with(2))(
        init_state(cfg_with(2), jax.random.PRNGKey(0)), batch, rng
    )
    np.testing.assert_allclose(
        float(m_full["d_loss"]), float(m_chunk["d_loss"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(m_full["g_loss"]), float(m_chunk["g_loss"]), rtol=1e-5, atol=1e-6
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves((full.g_params, full.d_params)),
        jax.tree_util.tree_leaves((chunked.g_params, chunked.d_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=5e-6, rtol=1e-4,
            err_msg="microbatched update diverged from full-batch update",
        )


def test_disc_microbatch_non_divisor_rounds_down():
    """A chunk size that doesn't divide B*T rounds down to a divisor and
    still trains (finite losses)."""
    cfg = tiny_config(rollout_length=3, batch_size=2, disc_microbatch=4)  # N=6 -> mb 3
    state, metrics = jit_train_step(cfg)(
        init_state(cfg, jax.random.PRNGKey(0)), make_batch(cfg), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["d_loss"]))


def test_ema_generator_weights():
    """ema_decay > 0 maintains g_ema = decay*ema + (1-decay)*params after
    every G update; off by default (g_ema absent from the state pytree)."""
    assert init_state(tiny_config(), jax.random.PRNGKey(0)).g_ema is None

    cfg = tiny_config(ema_decay=0.9)
    state = init_state(cfg, jax.random.PRNGKey(0))
    # At init the EMA equals the params.
    for e, p in zip(
        jax.tree_util.tree_leaves(state.g_ema),
        jax.tree_util.tree_leaves(state.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    init_g = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.g_params)
    state, _ = jit_train_step(cfg)(state, make_batch(cfg), jax.random.PRNGKey(1))
    expected = jax.tree_util.tree_map(
        lambda e, p: 0.9 * e + 0.1 * np.asarray(p), init_g, state.g_params
    )
    for e, w in zip(
        jax.tree_util.tree_leaves(state.g_ema),
        jax.tree_util.tree_leaves(expected),
    ):
        np.testing.assert_allclose(np.asarray(e), w, atol=1e-6, rtol=1e-6)


def test_batch_norm_disables_fold_and_microbatch():
    """norm='batch' must keep the scan-equivalent per-timestep BN moments:
    the teacher-forced fold runs at time_chunk=1 and disc_microbatch is
    ignored — a step with the knob set equals one without it EXACTLY."""
    def bn_cfg(mb):
        c = tiny_config(rollout_length=2, disc_microbatch=mb)
        return dataclasses.replace(c, model=dataclasses.replace(c.model, norm="batch"))

    batch = make_batch(bn_cfg(0))
    rng = jax.random.PRNGKey(5)
    a, ma = jit_train_step(bn_cfg(0))(init_state(bn_cfg(0), jax.random.PRNGKey(0)), batch, rng)
    b, mb_ = jit_train_step(bn_cfg(2))(init_state(bn_cfg(2), jax.random.PRNGKey(0)), batch, rng)
    assert float(ma["d_loss"]) == float(mb_["d_loss"])
    for pa, pb in zip(
        jax.tree_util.tree_leaves((a.g_params, a.d_params)),
        jax.tree_util.tree_leaves((b.g_params, b.d_params)),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_r1_penalty_matches_independent_computation():
    """d_r1 at step 1 equals the penalty computed outside the step on the
    same init D params and real transitions (disc_steps=1 so the metric's
    last-iteration aux IS the init-params value), and the D loss carries
    the γ/2-weighted term."""
    from action_conditioned_gans_tpu.models import Discriminator

    cfg = tiny_config(r1_weight=7.0)
    state = init_state(cfg, jax.random.PRNGKey(0))
    # The jitted step donates the state buffers: snapshot D's params first.
    d0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.d_params)
    batch = make_batch(cfg)
    _, m = jit_train_step(cfg)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["d_r1"])) and float(m["d_r1"]) > 0

    disc = Discriminator(cfg.model)
    real = np.asarray(batch["frames"][:, 1]).astype(np.float32)
    cond = np.asarray(batch["frames"][:, 0]).astype(np.float32)
    act = np.asarray(batch["actions"][:, 0]).astype(np.float32)

    def score(x):
        return disc.apply({"params": d0}, x, cond, act, None).sum()

    gx = jax.grad(score)(jnp.asarray(real))
    manual = float(
        jnp.mean(jnp.sum(jnp.square(gx), axis=tuple(range(1, gx.ndim))))
    )
    np.testing.assert_allclose(float(m["d_r1"]), manual, rtol=1e-5)


def test_r1_microbatch_equivalence():
    """Second-order R1 grads accumulate exactly through the microbatch
    scan: chunked and full-batch paths produce the same update and the
    same penalty value."""
    def cfg_with(mb):
        return tiny_config(rollout_length=4, batch_size=2, r1_weight=3.0,
                           disc_microbatch=mb)

    batch = make_batch(cfg_with(0))
    rng = jax.random.PRNGKey(3)
    full, m_full = jit_train_step(cfg_with(0))(
        init_state(cfg_with(0), jax.random.PRNGKey(0)), batch, rng
    )
    chunked, m_chunk = jit_train_step(cfg_with(2))(
        init_state(cfg_with(2), jax.random.PRNGKey(0)), batch, rng
    )
    np.testing.assert_allclose(
        float(m_full["d_r1"]), float(m_chunk["d_r1"]), rtol=1e-5, atol=1e-7
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(full.d_params),
        jax.tree_util.tree_leaves(chunked.d_params),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=5e-6, rtol=1e-4,
            err_msg="R1-microbatched update diverged from full-batch",
        )


def test_r1_off_keeps_metrics_and_updates_unchanged():
    """r1_weight=0 must be a true no-op: no d_r1 key, and the D update is
    bit-identical to a build without the feature's extra graph."""
    cfg = tiny_config()
    state = init_state(cfg, jax.random.PRNGKey(0))
    _, m = jit_train_step(cfg)(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert "d_r1" not in m

"""Differentiable D-input augmentation (train/augment.py + the d_augment
knob in the fused step)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.train import augment
from tests.test_train_step import make_batch, tiny_config
from action_conditioned_gans_tpu.train import init_state
from action_conditioned_gans_tpu.train.step import jit_train_step


def test_parse_policy():
    assert augment.parse_policy("") == ()
    assert augment.parse_policy("color, translation") == ("color", "translation")
    with pytest.raises(ValueError, match="d_augment"):
        augment.parse_policy("color,flip")


def test_translation_known_shift():
    """u chosen so dy=+1, dx=-1: pixels move accordingly, zeros roll in."""
    ops = ("translation",)
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    # H=W=4 -> s=1, range {-1,0,1} via floor(u*3)-1: u=0.9 -> +1; u=0.1 -> -1.
    u = jnp.array([[0.9, 0.1]], jnp.float32)
    out, _ = augment.apply(ops, u, x)
    ref = np.zeros((4, 4), np.float32)
    # dynamic_slice start (s+dy, s+dx) = (2, 0): out[y,x] = padded[y+2, x+0]
    # = x[y+1, x-1] where valid.
    src = np.arange(16, dtype=np.float32).reshape(4, 4)
    ref[:3, 1:] = src[1:, :3]
    np.testing.assert_array_equal(np.asarray(out)[0, :, :, 0], ref)


def test_cutout_zeroes_exact_box():
    ops = ("cutout",)
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    # H=W=4 -> box 2x2, corner range [0, 2]: u=0 -> (0,0); u=0.99 -> (2,2).
    out, _ = augment.apply(ops, jnp.array([[0.0, 0.99]], jnp.float32), x)
    got = np.asarray(out)[0, :, :, 0]
    assert got[0:2, 2:4].sum() == 0.0  # the box
    assert got.sum() == 16 - 4  # and nothing else


def test_pair_gets_identical_transform():
    ops = ("color", "translation", "cutout")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3), jnp.float32)
    u = augment.draw_params(key, ops, 4)
    a1, a2 = augment.apply(ops, u, x, x)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_deterministic_and_differentiable():
    ops = ("color", "translation", "cutout")
    u = augment.draw_params(jax.random.PRNGKey(0), ops, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
    o1, _ = augment.apply(ops, u, x)
    o2, _ = augment.apply(ops, u, x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    g = jax.grad(lambda y: jnp.sum(augment.apply(ops, u, y)[0] ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_augmented_step_trains():
    cfg = tiny_config(d_augment="color,translation,cutout")
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    batch = make_batch(cfg)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.g_params)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in m.values())
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(before),
            jax.tree_util.tree_leaves(state.g_params),
        )
    )
    assert moved


def test_augment_microbatch_equivalence():
    """Aug params are pre-drawn for the full folded batch, so the chunked
    and full-batch paths see identical augmented images — updates match."""
    def cfg_with(mb):
        return tiny_config(
            rollout_length=4, batch_size=2, disc_microbatch=mb,
            d_augment="color,translation,cutout",
        )

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
    for pa, pb in zip(
        jax.tree_util.tree_leaves((full.g_params, full.d_params)),
        jax.tree_util.tree_leaves((chunked.g_params, chunked.d_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=5e-6, rtol=1e-4,
            err_msg="augmented microbatch diverged from full-batch",
        )


def test_bad_policy_fails_at_build():
    cfg = tiny_config(d_augment="color,zoom")
    with pytest.raises(ValueError, match="d_augment"):
        jit_train_step(cfg)

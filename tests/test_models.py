"""Shape/dtype/range unit tests for the model family (SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.config import ModelConfig
from action_conditioned_gans_tpu.models import Discriminator, Generator, tile_condition

CPU_CFG = dict(compute_dtype="float32")  # tests run on CPU


def _init_io(cfg: ModelConfig, batch=2, seed=0):
    k = jax.random.PRNGKey(seed)
    kf, ka, ks = jax.random.split(k, 3)
    frame = jax.random.uniform(
        kf, (batch, cfg.image_size, cfg.image_size, cfg.image_channels), minval=-1, maxval=1
    )
    action = jax.random.normal(ka, (batch, cfg.action_dim))
    state = jax.random.normal(ks, (batch, cfg.state_dim)) if cfg.state_dim else None
    return frame, action, state


def test_tile_condition_broadcast():
    action = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
    t = tile_condition(action, None, 8, 8)
    assert t.shape == (2, 8, 8, 4)
    # Every spatial position carries the same action vector.
    np.testing.assert_array_equal(np.asarray(t[1, 3, 5]), np.asarray(action[1]))


def test_tile_condition_with_state():
    action = jnp.ones((2, 4))
    state = jnp.full((2, 3), 2.0)
    t = tile_condition(action, state, 4, 4)
    assert t.shape == (2, 4, 4, 7)
    np.testing.assert_array_equal(np.asarray(t[0, 0, 0]), [1, 1, 1, 1, 2, 2, 2])


@pytest.mark.parametrize("norm", ["group", "batch", "none"])
def test_generator_shape_and_range(norm):
    cfg = ModelConfig(image_size=32, g_levels=3, g_base_channels=8, norm=norm, **CPU_CFG)
    gen = Generator(cfg)
    frame, action, state = _init_io(cfg)
    params = gen.init(jax.random.PRNGKey(0), frame, action, state)
    out = gen.apply(params, frame, action, state)
    assert out.shape == frame.shape
    assert out.dtype == jnp.float32
    # tanh output: strictly within [-1, 1]
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_generator_state_conditioning():
    cfg = ModelConfig(
        image_size=32, g_levels=3, g_base_channels=8, state_dim=3, **CPU_CFG
    )
    gen = Generator(cfg)
    frame, action, state = _init_io(cfg)
    params = gen.init(jax.random.PRNGKey(0), frame, action, state)
    out1 = gen.apply(params, frame, action, state)
    out2 = gen.apply(params, frame, action, state + 1.0)
    # state input must actually influence the output
    assert float(jnp.max(jnp.abs(out1 - out2))) > 0

    with pytest.raises(ValueError):
        gen.apply(params, frame, action, None)


def test_generator_action_conditioning_matters():
    cfg = ModelConfig(image_size=32, g_levels=3, g_base_channels=8, **CPU_CFG)
    gen = Generator(cfg)
    frame, action, _ = _init_io(cfg)
    params = gen.init(jax.random.PRNGKey(0), frame, action)
    d = gen.apply(params, frame, action) - gen.apply(params, frame, action + 1.0)
    assert float(jnp.max(jnp.abs(d))) > 0


def test_generator_skip_connections():
    cfg = ModelConfig(
        image_size=32, g_levels=3, g_base_channels=8, skip_connections=True, **CPU_CFG
    )
    gen = Generator(cfg)
    frame, action, _ = _init_io(cfg)
    params = gen.init(jax.random.PRNGKey(0), frame, action)
    assert gen.apply(params, frame, action).shape == frame.shape


def test_discriminator_logit_shape():
    cfg = ModelConfig(image_size=32, d_levels=3, d_base_channels=8, **CPU_CFG)
    disc = Discriminator(cfg)
    frame, action, _ = _init_io(cfg, batch=3)
    nxt = frame + 0.01
    params = disc.init(jax.random.PRNGKey(0), nxt, frame, action)
    logit = disc.apply(params, nxt, frame, action)
    assert logit.shape == (3,)
    assert logit.dtype == jnp.float32


def test_discriminator_deeper_variant():
    cfg = ModelConfig(
        image_size=32, d_levels=3, d_base_channels=8, d_extra_layers=1, **CPU_CFG
    )
    disc = Discriminator(cfg)
    frame, action, _ = _init_io(cfg)
    params = disc.init(jax.random.PRNGKey(0), frame, frame, action)
    deep_names = [k for k in params["params"] if "extra" in k]
    assert len(deep_names) == 3  # one extra layer per level
    assert disc.apply(params, frame, frame, action).shape == (2,)


def test_discriminator_unconditional_variant():
    cfg = ModelConfig(
        image_size=32,
        d_levels=3,
        d_base_channels=8,
        d_condition_frame=False,
        d_condition_action=False,
        **CPU_CFG,
    )
    disc = Discriminator(cfg)
    frame, _, _ = _init_io(cfg)
    params = disc.init(jax.random.PRNGKey(0), frame)
    assert disc.apply(params, frame).shape == (2,)


def test_no_tracer_leaks():
    """SURVEY.md §6: jax.checking_leaks in tests — the jitted model paths
    must not capture tracers in Python state."""
    cfg = ModelConfig(image_size=16, g_levels=2, g_base_channels=8, **CPU_CFG)
    gen = Generator(cfg)
    frame, action, _ = _init_io(cfg)
    params = gen.init(jax.random.PRNGKey(0), frame, action)
    with jax.checking_leaks():
        out = jax.jit(lambda p, f, a: gen.apply(p, f, a))(params, frame, action)
        jax.block_until_ready(out)


def test_bfloat16_compute_fp32_params():
    cfg = ModelConfig(image_size=32, g_levels=3, g_base_channels=8, compute_dtype="bfloat16")
    gen = Generator(cfg)
    frame, action, _ = _init_io(cfg)
    params = gen.init(jax.random.PRNGKey(0), frame, action)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = gen.apply(params, frame, action)
    assert out.dtype == jnp.bfloat16

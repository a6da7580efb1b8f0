"""Checkpoint/resume tests (SURVEY.md §5.6): round-trip is bit-exact,
latest-N retention works."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.train import init_state
from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager


def tiny_config() -> Config:
    return Config(
        name="tiny-ckpt",
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
        train=TrainConfig(batch_size=2),
    )


def test_round_trip_bit_exact(tmp_path):
    cfg = tiny_config()
    state = init_state(cfg, jax.random.PRNGKey(0))
    state = dataclasses.replace(state, step=jnp.asarray(42, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    assert mgr.latest_step() is None
    mgr.save(42, jax.device_get(state), force=True)
    mgr.wait()
    assert mgr.latest_step() == 42

    template = init_state(cfg, jax.random.PRNGKey(123))  # different init
    restored = mgr.restore(template)
    assert int(restored.step) == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_keep_latest_n(tmp_path):
    cfg = tiny_config()
    state = jax.device_get(init_state(cfg, jax.random.PRNGKey(0)))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for s in (1, 2, 3):
        mgr.save(s, state, force=True)
    mgr.wait()
    assert mgr.latest_step() == 3
    mgr.close()

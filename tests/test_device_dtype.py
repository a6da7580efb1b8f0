"""data.device_dtype: frames staged to the device in bf16 (r3 bandwidth
lever). Contract: identical to feeding the float32 path a batch whose
frames were quantized through bf16 once at the input boundary — the models
cast inputs to compute_dtype at entry anyway, so only the input/target
pixels are quantized. Halves the stacked batch bank's HBM footprint and
per-step slice traffic (xprof r3) and host->device frame transfer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.data import make_dataset


def _cfg(**data_kw):
    return Config(
        name="devdtype",
        model=ModelConfig(
            image_size=16,
            g_levels=2,
            g_base_channels=8,
            d_levels=2,
            d_base_channels=8,
            group_norm_groups=4,
            compute_dtype="float32",
        ),
        data=DataConfig(device_dtype="bfloat16", **data_kw),
        train=TrainConfig(batch_size=2, rollout_length=1, seed=3),
    )


def test_synthetic_frames_bf16_actions_f32():
    ds = make_dataset(_cfg())
    b = ds.batch_at(0)
    assert b["frames"].dtype == jnp.bfloat16
    assert b["actions"].dtype == jnp.float32
    # The cast is the ONLY change: values equal the f32 stream quantized.
    ds32 = make_dataset(
        dataclasses.replace(_cfg(), data=DataConfig(device_dtype="float32"))
    )
    b32 = ds32.batch_at(0)
    np.testing.assert_array_equal(
        np.asarray(b["frames"], dtype=np.float32),
        np.asarray(jnp.asarray(b32["frames"]).astype(jnp.bfloat16), dtype=np.float32),
    )


def _write_fixture(tmp_path, n_clips=8, clip_len=4, hw=16):
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        load_library,
        write_clips_tfrecord_native,
    )

    load_library()
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(n_clips, clip_len, hw, hw, 3), dtype=np.uint8)
    actions = rng.randn(n_clips, clip_len, 4).astype(np.float32)
    states = rng.randn(n_clips, clip_len, 3).astype(np.float32)
    write_clips_tfrecord_native(str(tmp_path / "clips.tfrecord"), frames, actions, states)


@pytest.mark.parametrize("source", ["tfrecord", "tfrecord_native"])
@pytest.mark.parametrize("stack", [1, 2])
def test_file_sources_stage_bf16(tmp_path, source, stack):
    if source == "tfrecord":
        pytest.importorskip("tensorflow")
    _write_fixture(tmp_path)
    cfg = _cfg(
        source=source,
        data_dir=str(tmp_path),
        clip_len=4,
        raw_image_size=16,
        shuffle_buffer=4,
        tfrecord_encoding="raw",
    )
    ds = make_dataset(cfg, stack=stack)
    try:
        b = ds.batch_at(0)
        assert np.asarray(b["frames"]).dtype == jnp.bfloat16
        assert np.asarray(b["actions"]).dtype == np.float32
        lead = (stack, cfg.train.batch_size) if stack > 1 else (cfg.train.batch_size,)
        assert np.asarray(b["frames"]).shape[: len(lead)] == lead
    finally:
        ds.close()


def test_train_step_bf16_batch_equals_quantized_f32_batch():
    """step(bf16 batch) == step(f32 batch pre-quantized through bf16),
    bit-exact: the bf16->f32 upcast at the model's compute-dtype cast is
    value-preserving, so device_dtype changes WHERE the quantization
    happens, never the arithmetic."""
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.train import init_state
    from action_conditioned_gans_tpu.train.step import jit_train_step

    cfg = _cfg()
    batch = generate_clips(
        jax.random.PRNGKey(7),
        cfg.train.batch_size,
        cfg.train.rollout_length + 1,
        cfg.model.image_size,
        cfg.model.action_dim,
    )
    b_bf16 = dict(batch, frames=batch["frames"].astype(jnp.bfloat16))
    b_quant = dict(batch, frames=b_bf16["frames"].astype(jnp.float32))

    outs = []
    for b in (b_bf16, b_quant):
        state = init_state(cfg, jax.random.PRNGKey(0))
        state, metrics = jit_train_step(cfg)(state, b, jax.random.PRNGKey(1))
        outs.append((state, metrics))
    (s_a, m_a), (s_b, m_b) = outs
    for k in m_a:
        np.testing.assert_array_equal(np.asarray(m_a[k]), np.asarray(m_b[k]), err_msg=k)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_a.g_params), jax.tree_util.tree_leaves(s_b.g_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

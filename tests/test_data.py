"""Data-pipeline tests (SURVEY.md §5.5): seeded synthetic generator is
deterministic, correctly shaped/ranged, and physically action-conditioned."""

import jax
import jax.numpy as jnp
import numpy as np

from action_conditioned_gans_tpu.config import get_preset
from action_conditioned_gans_tpu.data import SyntheticClips, generate_clips, make_dataset


def test_shapes_and_ranges():
    batch = generate_clips(jax.random.PRNGKey(0), 2, 5, 32, 4)
    assert batch["frames"].shape == (2, 5, 32, 32, 3)
    assert batch["actions"].shape == (2, 4, 4)
    assert batch["states"].shape == (2, 4, 3)
    f = np.asarray(batch["frames"])
    assert f.min() >= -1.0 and f.max() <= 1.0
    assert f.max() > 0  # not all-black
    a = np.asarray(batch["actions"])
    assert np.abs(a).max() <= 1.0


def test_determinism_and_seed_sensitivity():
    b1 = generate_clips(jax.random.PRNGKey(7), 2, 4, 32, 4)
    b2 = generate_clips(jax.random.PRNGKey(7), 2, 4, 32, 4)
    b3 = generate_clips(jax.random.PRNGKey(8), 2, 4, 32, 4)
    np.testing.assert_array_equal(np.asarray(b1["frames"]), np.asarray(b2["frames"]))
    assert np.abs(np.asarray(b1["frames"]) - np.asarray(b3["frames"])).max() > 0


def test_frames_move_with_actions():
    # Consecutive frames must differ (the pusher moves every step).
    b = generate_clips(jax.random.PRNGKey(3), 4, 6, 32, 4)
    f = np.asarray(b["frames"])
    per_step_change = np.abs(f[:, 1:] - f[:, :-1]).mean(axis=(2, 3, 4))
    assert (per_step_change > 1e-4).all()


def test_state_tracks_pusher():
    # End-effector state stays within the arena and changes over time.
    b = generate_clips(jax.random.PRNGKey(5), 2, 8, 32, 4)
    s = np.asarray(b["states"])
    assert s[..., :2].min() >= 0.0 and s[..., :2].max() <= 1.0
    assert np.abs(s[:, 1:, :2] - s[:, :-1, :2]).max() > 0


def test_iterator_indexing_restartable():
    ds = SyntheticClips(batch=2, seq_len=3, image_size=32, seed=0)
    a = ds.batch_at(5)
    b = ds.batch_at(5)
    c = ds.batch_at(6)
    np.testing.assert_array_equal(np.asarray(a["frames"]), np.asarray(b["frames"]))
    assert np.abs(np.asarray(a["frames"]) - np.asarray(c["frames"])).max() > 0


def test_make_dataset_from_preset():
    cfg = get_preset("config1")
    ds = make_dataset(cfg)
    batch = next(iter(ds))
    # config1: single-step -> frames (B, 2, 64, 64, 3), actions (B, 1, 4)
    assert batch["frames"].shape == (8, 2, 64, 64, 3)
    assert batch["actions"].shape == (8, 1, 4)


def test_synthetic_states_are_at_source_frame():
    """states[t] is the end-effector state AT source frame t (pre-action) —
    the file-source contract: frame 0's state has grip 0 (nothing applied
    yet), and the xy recurrence state_{t+1} = clip(state_t + action_t[:2])
    holds exactly (the pre-r2b post-action emission failed both)."""
    b = generate_clips(jax.random.PRNGKey(11), 3, 5, 16, 4)
    s = np.asarray(b["states"], np.float64)  # (B, T, 3)
    a = np.asarray(b["actions"], np.float64)  # (B, T, 4)
    np.testing.assert_array_equal(s[:, 0, 2], 0.0)  # frame-0 grip
    margin = 0.08
    nxt = np.clip(s[:, :-1, :2] + a[:, :-1, :2], margin, 1 - margin)
    np.testing.assert_allclose(s[:, 1:, :2], nxt, atol=1e-6)
    np.testing.assert_allclose(s[:, 1:, 2], a[:, :-1, 2], atol=1e-6)


def test_native_shuffle_buffer_permutes_deterministically():
    """shuffle_buffer > 1 emits the SAME multiset of clips per epoch in a
    different, seed-deterministic order (tf.data shuffle semantics; the
    native reader used to ignore shuffling entirely)."""
    import tempfile

    import pytest

    from action_conditioned_gans_tpu.data.native_tfrecord import (
        NativeTFRecordClips,
        load_library,
        write_clips_tfrecord_native,
    )

    try:
        load_library()
    except Exception:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as tmp:
        frames = rng.randint(0, 256, size=(12, 3, 8, 8, 3), dtype=np.uint8)
        actions = rng.randn(12, 3, 4).astype(np.float32)
        states = rng.randn(12, 3, 3).astype(np.float32)
        # Stamp each clip's identity into its first pixel.
        frames[:, :, 0, 0, 0] = np.arange(12)[:, None]
        write_clips_tfrecord_native(f"{tmp}/c.tfrecord", frames, actions, states)

        def ids(**kw):
            ds = NativeTFRecordClips(
                tmp, batch=12, seq_len=3, image_size=8, clip_len=3,
                raw_image_size=8, repeat=False, **kw,
            )
            b = ds.batch_at(0)
            # invert the [-1,1] normalization of the stamped uint8 pixel
            px = (np.asarray(b["frames"])[:, 0, 0, 0, 0] + 1) / 2 * 255
            return [int(round(v)) for v in px]

        plain = ids()
        shuf_a = ids(shuffle_buffer=4, seed=7)
        shuf_b = ids(shuffle_buffer=4, seed=7)
        shuf_c = ids(shuffle_buffer=4, seed=8)
        assert plain == list(range(12))
        assert sorted(shuf_a) == list(range(12))  # same multiset
        assert shuf_a != plain  # actually permuted
        assert shuf_a == shuf_b  # seed-deterministic
        assert shuf_a != shuf_c  # seed-sensitive

"""File-source resume fast-forward (VERDICT r2 missing 2 / SURVEY.md §6
checkpoint-resume row): a resumed run must consume exactly the batches an
uninterrupted run would have consumed at the same step — no silent replay
of the stream from the beginning."""

import dataclasses

import numpy as np
import pytest

from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig


def _write_fixture(tmp_path, n_clips=24, clip_len=6, hw=16):
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        load_library,
        write_clips_tfrecord_native,
    )

    load_library()
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(n_clips, clip_len, hw, hw, 3), dtype=np.uint8)
    actions = rng.randn(n_clips, clip_len, 4).astype(np.float32)
    states = rng.randn(n_clips, clip_len, 3).astype(np.float32)
    path = str(tmp_path / "clips.tfrecord")
    write_clips_tfrecord_native(path, frames, actions, states)
    return path


def _collect(reader, n):
    return [
        {k: np.asarray(v) for k, v in reader.batch_at(i).items()} for i in range(n)
    ]


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=k)


@pytest.mark.parametrize("source", ["tfrecord", "tfrecord_native"])
def test_reader_start_batch_matches_uninterrupted_stream(tmp_path, source):
    """start_batch=s yields exactly batches s, s+1, ... of the start_batch=0
    stream — with shuffle ON, proving the shuffle/window rng state is
    replayed, not reset."""
    if source == "tfrecord":
        pytest.importorskip("tensorflow")
    _write_fixture(tmp_path)

    def make(start):
        kw = dict(
            data_dir=str(tmp_path),
            batch=3,
            seq_len=3,
            image_size=16,
            clip_len=6,
            raw_image_size=16,
            shuffle_buffer=8,
            seed=11,
            start_batch=start,
        )
        if source == "tfrecord":
            from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

            return TFRecordClips(encoding="raw", **kw)
        from action_conditioned_gans_tpu.data.native_tfrecord import (
            NativeTFRecordClips,
        )

        return NativeTFRecordClips(**kw)

    full = _collect(make(0), 7)
    resumed = _collect(make(4), 3)
    _assert_batches_equal(resumed, full[4:])
    # Sanity: the stream is not trivially constant (shuffle actually ran).
    assert not np.array_equal(full[0]["frames"], full[4]["frames"])


@pytest.mark.parametrize("source", ["tfrecord", "tfrecord_native"])
def test_make_dataset_start_call_fast_forwards(tmp_path, source):
    """The pipeline-level wiring: make_dataset(start_call=c) with
    steps_per_call stacking resumes at stacked batch c."""
    if source == "tfrecord":
        pytest.importorskip("tensorflow")
    _write_fixture(tmp_path)
    from action_conditioned_gans_tpu.data import make_dataset

    cfg = Config(
        name="resume-data",
        model=ModelConfig(image_size=16, compute_dtype="float32"),
        data=DataConfig(
            source=source,
            data_dir=str(tmp_path),
            clip_len=6,
            raw_image_size=16,
            shuffle_buffer=4,
            tfrecord_encoding="raw",
        ),
        train=TrainConfig(batch_size=2, rollout_length=2, steps_per_call=2, seed=5),
    )

    ds_full = make_dataset(cfg, stack=2)
    full = _collect(ds_full, 5)
    ds_full.close()

    ds_resumed = make_dataset(cfg, stack=2, start_call=3)
    resumed = _collect(ds_resumed, 2)
    ds_resumed.close()
    _assert_batches_equal(resumed, full[3:])


def test_train_loop_passes_start_call_on_resume(tmp_path, monkeypatch):
    """Integration: after a checkpointed run stops at step N, the resumed
    train() constructs its dataset with start_call = N / steps_per_call."""
    import jax

    from action_conditioned_gans_tpu.train import loop as loop_mod

    calls = []
    real_make_dataset = loop_mod.make_dataset

    def spy(cfg, **kw):
        calls.append(kw.get("start_call", 0))
        return real_make_dataset(cfg, **kw)

    monkeypatch.setattr(loop_mod, "make_dataset", spy)

    cfg = Config(
        name="resume-loop",
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
            total_steps=8,
            steps_per_call=2,
            checkpoint_every=2,
            log_every=100,
            sample_every=0,
        ),
        workdir=str(tmp_path),
    )
    loop_mod.train(cfg, max_steps=4)
    loop_mod.train(cfg, max_steps=8)
    assert calls == [0, 2]  # resumed at step 4 with k=2 -> start_call 2


def test_native_fast_forward_skips_without_decoding(tmp_path):
    """The decode-free skim (r3 review): fast-forwarding over K consumed
    clips parses only the <= shuffle_buffer clips still occupying the
    buffer at the resume point, not all K."""
    from action_conditioned_gans_tpu.data import native_tfrecord as nt

    _write_fixture(tmp_path)
    calls = {"n": 0}
    real = nt.parse_clip_record

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    reader = nt.NativeTFRecordClips(
        data_dir=str(tmp_path),
        batch=3,
        seq_len=3,
        image_size=16,
        clip_len=6,
        raw_image_size=16,
        shuffle_buffer=4,
        seed=11,
        start_batch=4,  # 12 clips consumed pre-resume
    )
    try:
        nt.parse_clip_record = counting
        first = reader.batch_at(0)
    finally:
        nt.parse_clip_record = real
    assert np.asarray(first["frames"]).shape[0] == 3
    # 4 buffer survivors from the skipped prefix + 3 emitted for this batch
    # (each emission parses the incoming replacement clip).
    assert calls["n"] <= 4 + 3, calls["n"]

"""Crop-stage tests (SURVEY.md §1 capability 1: decode -> crop/resize ->
normalize; VERDICT r2 missing 3). Both file readers must produce identical
crops from the same records and seed."""

import numpy as np
import pytest

from action_conditioned_gans_tpu.data.cropping import crop_offsets


def _fixture(tmp_path, n_clips=6, clip_len=4, hw=16):
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        load_library,
        write_clips_tfrecord_native,
    )

    load_library()
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(n_clips, clip_len, hw, hw, 3), dtype=np.uint8)
    actions = rng.randn(n_clips, clip_len, 4).astype(np.float32)
    states = rng.randn(n_clips, clip_len, 3).astype(np.float32)
    write_clips_tfrecord_native(str(tmp_path / "c.tfrecord"), frames, actions, states)
    return frames


def _reader(tmp_path, source, **kw):
    base = dict(
        data_dir=str(tmp_path),
        batch=2,
        seq_len=4,
        image_size=kw.pop("image_size", 8),
        clip_len=4,
        raw_image_size=16,
        shuffle_buffer=1,  # no-op shuffle: aligns the two readers exactly
        seed=3,
    )
    base.update(kw)
    if source == "tfrecord":
        from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

        return TFRecordClips(encoding="raw", **base)
    from action_conditioned_gans_tpu.data.native_tfrecord import NativeTFRecordClips

    return NativeTFRecordClips(**base)


def test_crop_offsets_center_and_random():
    assert crop_offsets(0, 0, 16, 8, random=False) == (4, 4)
    assert crop_offsets(0, 0, 16, 16, random=True) == (0, 0)  # span 1
    # Deterministic in (seed, index); varies across indices; in range.
    offs = {crop_offsets(5, i, 16, 8, random=True) for i in range(50)}
    assert len(offs) > 5
    for oy, ox in offs:
        assert 0 <= oy <= 8 and 0 <= ox <= 8
    assert crop_offsets(5, 3, 16, 8, True) == crop_offsets(5, 3, 16, 8, True)
    assert crop_offsets(5, 3, 16, 8, True) != crop_offsets(6, 3, 16, 8, True)


def test_center_crop_pixels_native(tmp_path):
    """Native reader, crop == image_size (no resize): output equals the
    manual center crop of the stored frames, normalized."""
    frames = _fixture(tmp_path)
    r = _reader(tmp_path, "tfrecord_native", crop=8, image_size=8)
    got = np.asarray(r.batch_at(0)["frames"])
    want = frames[:2, :, 4:12, 4:12].astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("random_crop", [False, True])
def test_cross_reader_crop_identical(tmp_path, random_crop):
    """tf.data and native readers produce IDENTICAL cropped batches from the
    same records and seed (the VERDICT r2 'Done' criterion), for both
    center and stateless-random crops."""
    pytest.importorskip("tensorflow")
    _fixture(tmp_path)
    kw = dict(crop=8, crop_random=random_crop, image_size=8)
    a = _reader(tmp_path, "tfrecord", **kw)
    b = _reader(tmp_path, "tfrecord_native", **kw)
    for i in range(3):
        ba = {k: np.asarray(v) for k, v in a.batch_at(i).items()}
        bb = {k: np.asarray(v) for k, v in b.batch_at(i).items()}
        for k in ba:
            np.testing.assert_allclose(ba[k], bb[k], atol=1e-6, err_msg=k)


def test_random_crop_differs_from_center(tmp_path):
    _fixture(tmp_path)
    c = np.asarray(_reader(tmp_path, "tfrecord_native", crop=8, crop_random=False).batch_at(0)["frames"])
    r = np.asarray(_reader(tmp_path, "tfrecord_native", crop=8, crop_random=True).batch_at(0)["frames"])
    assert not np.array_equal(c, r)


def test_crop_then_resize(tmp_path):
    """crop != image_size exercises the crop->resize chain in both readers
    with identical output."""
    pytest.importorskip("tensorflow")
    _fixture(tmp_path)
    kw = dict(crop=12, crop_random=True, image_size=8)
    a = _reader(tmp_path, "tfrecord", **kw)
    b = _reader(tmp_path, "tfrecord_native", **kw)
    ba = np.asarray(a.batch_at(0)["frames"])
    bb = np.asarray(b.batch_at(0)["frames"])
    assert ba.shape == (2, 4, 8, 8, 3)
    np.testing.assert_allclose(ba, bb, atol=1e-5)


def test_crop_survives_resume_fast_forward(tmp_path):
    """Random crops are keyed on the ABSOLUTE stream index, so a
    fast-forwarded reader reproduces the uninterrupted crops."""
    _fixture(tmp_path, n_clips=12)
    kw = dict(crop=8, crop_random=True, image_size=8)
    base = _reader(tmp_path, "tfrecord_native", **kw)
    full = [
        {k: np.asarray(v) for k, v in base.batch_at(i).items()} for i in range(4)
    ]
    resumed = _reader(tmp_path, "tfrecord_native", start_batch=2, **kw)
    for i, want in enumerate(full[2:]):
        got = {k: np.asarray(v) for k, v in resumed.batch_at(i).items()}
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_invalid_crop_rejected(tmp_path):
    _fixture(tmp_path)
    with pytest.raises(ValueError, match="crop"):
        _reader(tmp_path, "tfrecord_native", crop=32)


def test_crop_offsets_tf_matches_numpy_hash():
    """Bit-for-bit equality of the graph-mode splitmix64 with the shared
    numpy/native hash, across seeds/indices (incl. >2^31 indices) and both
    crop modes."""
    tf = pytest.importorskip("tensorflow")
    from action_conditioned_gans_tpu.data.cropping import crop_offsets, crop_offsets_tf

    for seed in (0, 11, 2**31, 2**63 - 1):
        for index in (0, 1, 7, 12345, 2**32 + 9):
            for random in (False, True):
                want = crop_offsets(seed, index, 64, 48, random)
                got = tuple(
                    crop_offsets_tf(
                        seed, tf.constant(index, tf.int64), 64, 48, random
                    ).numpy()
                )
                assert got == want, (seed, index, random, got, want)

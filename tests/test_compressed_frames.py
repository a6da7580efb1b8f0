"""Compressed-frame (PNG/JPEG payload) contract tests (VERDICT r2 weak 4):
the tf.data reader's "image"/"auto" branches and the native reader's PIL
fallback, exercised against real PNG fixtures — previously dead code."""

import numpy as np
import pytest

from action_conditioned_gans_tpu.data.native_tfrecord import (
    load_library,
    read_clips,
    write_clips_tfrecord_native,
)


def _png_fixture(tmp_path, n=3, t=4, hw=16, seed=0, name="png.tfrecord"):
    load_library()
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=(n, t, hw, hw, 3), dtype=np.uint8)
    actions = rng.randn(n, t, 4).astype(np.float32)
    states = rng.randn(n, t, 3).astype(np.float32)
    write_clips_tfrecord_native(
        str(tmp_path / name), frames, actions, states, encoding="png"
    )
    return frames, actions, states


def test_native_reader_decodes_png_frames(tmp_path):
    """encoding='auto' detects the compressed payload and round-trips the
    PNG losslessly; actions/states come from the float-only parse path."""
    frames, actions, states = _png_fixture(tmp_path)
    got = list(read_clips(str(tmp_path / "png.tfrecord"), 4, 16, 16))
    assert len(got) == 3
    for i, (f, a, s) in enumerate(got):
        np.testing.assert_array_equal(f, frames[i])
        np.testing.assert_allclose(a, actions[i], rtol=1e-6)
        np.testing.assert_allclose(s, states[i], rtol=1e-6)


def test_native_reader_raw_mode_rejects_png_with_clear_error(tmp_path):
    _png_fixture(tmp_path)
    with pytest.raises(ValueError, match="compressed frames"):
        list(read_clips(str(tmp_path / "png.tfrecord"), 4, 16, 16, encoding="raw"))


def test_native_reader_image_mode_and_odd_size_resize(tmp_path):
    """PNG frames stored at a DIFFERENT size than the raw grid are resized
    (bilinear + round), matching the tf.data compressed arm."""
    load_library()
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, size=(2, 3, 24, 24, 3), dtype=np.uint8)
    actions = rng.randn(2, 3, 4).astype(np.float32)
    states = rng.randn(2, 3, 3).astype(np.float32)
    write_clips_tfrecord_native(
        str(tmp_path / "big.tfrecord"), frames, actions, states, encoding="png"
    )
    got = list(
        read_clips(str(tmp_path / "big.tfrecord"), 3, 16, 16, encoding="image")
    )
    assert len(got) == 2 and got[0][0].shape == (3, 16, 16, 3)

    tf = pytest.importorskip("tensorflow")
    want = np.clip(
        np.round(
            tf.image.resize(tf.cast(frames[0], tf.float32), (16, 16)).numpy()
        ),
        0,
        255,
    ).astype(np.uint8)
    np.testing.assert_array_equal(got[0][0], want)


@pytest.mark.parametrize("encoding", ["image", "auto"])
def test_tf_reader_decodes_png_frames(tmp_path, encoding):
    """The tf.data reader's compressed decode branches ('image' and the
    'auto' length-dispatch arm) on a real PNG fixture."""
    pytest.importorskip("tensorflow")
    frames, actions, _ = _png_fixture(tmp_path)
    from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

    ds = TFRecordClips(
        data_dir=str(tmp_path),
        batch=3,
        seq_len=4,
        image_size=16,
        clip_len=4,
        raw_image_size=16,
        shuffle_buffer=1,
        seed=0,
        repeat=False,
        encoding=encoding,
    )
    got = np.asarray(ds.batch_at(0)["frames"])
    want = frames.astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tf_reader_auto_resizes_odd_size_png_with_rounding(tmp_path):
    """'auto' + PNG stored at a non-raw size goes through resize + ROUND
    (ADVICE r2: a bare uint8 cast truncated toward zero)."""
    tf = pytest.importorskip("tensorflow")
    load_library()
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, size=(2, 3, 24, 24, 3), dtype=np.uint8)
    write_clips_tfrecord_native(
        str(tmp_path / "big.tfrecord"),
        frames,
        rng.randn(2, 3, 4).astype(np.float32),
        rng.randn(2, 3, 3).astype(np.float32),
        encoding="png",
    )
    from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

    ds = TFRecordClips(
        data_dir=str(tmp_path),
        batch=2,
        seq_len=3,
        image_size=16,
        clip_len=3,
        raw_image_size=16,
        shuffle_buffer=1,
        seed=0,
        repeat=False,
        encoding="auto",
    )
    got = np.asarray(ds.batch_at(0)["frames"])
    flat = frames.reshape(-1, 24, 24, 3)  # tf.image.resize wants <= 4-D
    resized = np.clip(
        np.round(tf.image.resize(tf.cast(flat, tf.float32), (16, 16)).numpy()),
        0,
        255,
    ).astype(np.uint8)
    want = resized.reshape(2, 3, 16, 16, 3).astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cross_reader_png_parity(tmp_path):
    """Both readers produce identical batches from the same PNG records."""
    pytest.importorskip("tensorflow")
    _png_fixture(tmp_path)
    from action_conditioned_gans_tpu.data.native_tfrecord import NativeTFRecordClips
    from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

    kw = dict(
        data_dir=str(tmp_path),
        batch=3,
        seq_len=4,  # full clip: window start deterministic in both readers
        image_size=16,
        clip_len=4,
        raw_image_size=16,
        shuffle_buffer=1,
        seed=9,
        repeat=False,
    )
    a = TFRecordClips(encoding="auto", **kw)
    b = NativeTFRecordClips(encoding="auto", **kw)
    ba = {k: np.asarray(v) for k, v in a.batch_at(0).items()}
    bb = {k: np.asarray(v) for k, v in b.batch_at(0).items()}
    for k in ba:
        np.testing.assert_allclose(ba[k], bb[k], atol=1e-6, err_msg=k)


def test_abi_version_exported():
    lib = load_library()
    from action_conditioned_gans_tpu.data.native_tfrecord import _EXPECTED_ABI, _lib_abi

    assert _lib_abi(lib) == _EXPECTED_ABI


def _png(img):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_native_reader_mixed_encoding_clip(tmp_path):
    """'auto' must fall back per-record even when frame 0 is raw-length
    (r3 review: the frame-0-length gate raised on mixed-encoding clips the
    per-frame PIL path explicitly supports)."""
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        _bytes_feature,
        _float_feature,
        encode_example,
    )

    lib = load_library()
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    feats = {
        "0/image_aux1/encoded": frames[0].tobytes(),  # raw
        "0/action": [0.0, 1.0, 2.0, 3.0],
        "0/endeffector_pos": [0.1, 0.2, 0.3],
        "1/image_aux1/encoded": _png(frames[1]),  # compressed
        "1/action": [4.0, 5.0, 6.0, 7.0],
        "1/endeffector_pos": [0.4, 0.5, 0.6],
    }
    # encode_example needs explicit Feature bytes only for raw payloads,
    # which its bytes branch already handles.
    payload = encode_example(feats)
    path = str(tmp_path / "mixed.tfrecord")
    w = lib.acgan_writer_open(path.encode())
    assert w and lib.acgan_writer_write(w, payload, len(payload)) == 0
    lib.acgan_writer_close(w)

    (got_f, got_a, _), = list(read_clips(path, 2, 16, 16, encoding="auto"))
    np.testing.assert_array_equal(got_f, frames)
    np.testing.assert_allclose(got_a[1], [4.0, 5.0, 6.0, 7.0])


@pytest.mark.parametrize("stored_hw", [(24, 12), (12, 24)])
def test_native_reader_non_square_png_resize(tmp_path, stored_hw):
    """Non-square stored frames resize on per-axis grids (r3 review: the
    H-derived column grid crashed taller-than-wide and mis-sampled
    wider-than-tall frames), matching tf.image.resize."""
    tf = pytest.importorskip("tensorflow")
    load_library()
    rng = np.random.RandomState(4)
    h, w = stored_hw
    frames = rng.randint(0, 256, size=(1, 2, h, w, 3), dtype=np.uint8)
    actions = rng.randn(1, 2, 4).astype(np.float32)
    states = rng.randn(1, 2, 3).astype(np.float32)
    write_clips_tfrecord_native(
        str(tmp_path / "ns.tfrecord"), frames, actions, states, encoding="png"
    )
    (got_f, _, _), = list(
        read_clips(str(tmp_path / "ns.tfrecord"), 2, 16, 16, encoding="image")
    )
    want = np.clip(
        np.round(tf.image.resize(tf.cast(frames[0], tf.float32), (16, 16)).numpy()),
        0,
        255,
    ).astype(np.uint8)
    np.testing.assert_array_equal(got_f, want)

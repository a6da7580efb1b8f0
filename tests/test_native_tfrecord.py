"""Native (TF-free) TFRecord I/O tests: C++ framing/CRC/Example parsing via
ctypes, cross-compatibility with the TensorFlow writer, corruption
detection."""

import numpy as np
import pytest

try:
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        NativeTFRecordClips,
        load_library,
        read_clips,
        write_clips_tfrecord_native,
    )

    load_library()
    HAVE_NATIVE = True
except Exception:  # no toolchain in this environment
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")


def fixture_arrays(n=3, t=6, hw=16, a=4, s=3, seed=0):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=(n, t, hw, hw, 3), dtype=np.uint8)
    actions = rng.randn(n, t, a).astype(np.float32)
    states = rng.randn(n, t, s).astype(np.float32)
    return frames, actions, states


def test_native_write_native_read_round_trip(tmp_path):
    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays()
    write_clips_tfrecord_native(path, frames, actions, states)

    got = list(read_clips(path, n_steps=6, height=16, width=16))
    assert len(got) == 3
    for i, (f, a, s) in enumerate(got):
        np.testing.assert_array_equal(f, frames[i])
        np.testing.assert_allclose(a, actions[i], rtol=1e-6)
        np.testing.assert_allclose(s, states[i], rtol=1e-6)


def test_tf_writer_native_reader_compat(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from action_conditioned_gans_tpu.data.tfrecord import write_clips_tfrecord

    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(seed=1)
    write_clips_tfrecord(path, frames, actions, states)  # TF writer
    got = list(read_clips(path, n_steps=6, height=16, width=16))  # native reader
    assert len(got) == 3
    np.testing.assert_array_equal(got[0][0], frames[0])
    np.testing.assert_allclose(got[1][1], actions[1], rtol=1e-6)


def test_native_writer_tf_reader_compat(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(seed=2, n=4)
    write_clips_tfrecord_native(path, frames, actions, states)
    ds = TFRecordClips(
        data_dir=str(tmp_path),
        batch=4,
        seq_len=6,
        image_size=16,
        clip_len=6,
        raw_image_size=16,
        repeat=False,
    )
    batch = ds.batch_at(0)
    assert np.asarray(batch["frames"]).shape == (4, 6, 16, 16, 3)


def test_fifo_source_reads_all_clips(tmp_path):
    """Non-regular-file sources (FIFO/pipe) report st_size=0 — the reader
    must NOT trust that as a real size (r4 review: the mmap-build open path
    set size_known=true unconditionally, turning every FIFO record into
    'corruption'); short freads detect EOF instead."""
    import os
    import subprocess

    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays()
    write_clips_tfrecord_native(path, frames, actions, states)

    fifo = str(tmp_path / "clips.fifo")
    os.mkfifo(fifo)
    feeder = subprocess.Popen(["/bin/sh", "-c", f"cat {path} > {fifo}"])
    try:
        got = list(read_clips(fifo, n_steps=6, height=16, width=16))
    finally:
        feeder.wait(timeout=30)
    assert len(got) == 3
    for i, (f, _, _) in enumerate(got):
        np.testing.assert_array_equal(f, frames[i])


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(n=1)
    write_clips_tfrecord_native(path, frames, actions, states)
    raw = bytearray(open(path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(read_clips(path, n_steps=6, height=16, width=16))


def test_empty_host_shard_raises(tmp_path):
    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(n=1)
    write_clips_tfrecord_native(path, frames, actions, states)
    with pytest.raises(ValueError, match="empty TFRecord shard"):
        NativeTFRecordClips(
            data_dir=str(tmp_path),
            batch=1,
            seq_len=2,
            image_size=16,
            clip_len=6,
            raw_image_size=16,
            host_id=1,
            num_hosts=2,
        )


def _masked_crc32c(data: bytes) -> int:
    # Same table CRC32C + TFRecord masking as the C++ side (test-local copy).
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (0x82F63B78 ^ (crc >> 1)) if crc & 1 else crc >> 1
    crc ^= 0xFFFFFFFF
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_huge_length_header_is_corruption_not_crash(tmp_path):
    """A record header whose 64-bit length is huge but whose length-CRC is
    self-consistent must surface as the -1 corruption code (IOError here),
    not a bad_alloc/std::terminate across the C ABI (ADVICE r1)."""
    import struct

    path = str(tmp_path / "evil.tfrecord")
    length = struct.pack("<Q", 1 << 60)
    hdr = length + struct.pack("<I", _masked_crc32c(length))
    with open(path, "wb") as f:
        f.write(hdr + b"\x00" * 64)
    with pytest.raises(IOError):
        list(read_clips(path, n_steps=6, height=16, width=16))


def test_reader_resize_parity_with_tf(tmp_path):
    """The two file readers must produce the SAME pixels for the same records
    when image_size != raw_image_size (ADVICE r1: they used nearest vs
    bilinear). Full-length window + shuffle_buffer=1 pins order."""
    pytest.importorskip("tensorflow")
    from action_conditioned_gans_tpu.data.tfrecord import TFRecordClips

    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(n=3, t=4, hw=16, seed=5)
    write_clips_tfrecord_native(path, frames, actions, states)
    kwargs = dict(
        data_dir=str(tmp_path),
        batch=3,
        seq_len=4,
        image_size=8,
        clip_len=4,
        raw_image_size=16,
        seed=0,
        repeat=False,
    )
    native = NativeTFRecordClips(**kwargs)
    tfds = TFRecordClips(shuffle_buffer=1, **kwargs)
    f_native = np.asarray(native.batch_at(0)["frames"])
    f_tf = np.asarray(tfds.batch_at(0)["frames"])
    np.testing.assert_allclose(f_native, f_tf, atol=2e-5)


def test_native_clips_batch_contract(tmp_path):
    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(n=4, t=8)
    write_clips_tfrecord_native(path, frames, actions, states)
    ds = NativeTFRecordClips(
        data_dir=str(tmp_path),
        batch=2,
        seq_len=3,
        image_size=16,
        clip_len=8,
        raw_image_size=16,
        seed=0,
    )
    b = ds.batch_at(0)
    f = np.asarray(b["frames"])
    assert f.shape == (2, 3, 16, 16, 3)
    assert np.asarray(b["actions"]).shape == (2, 2, 4)
    assert np.asarray(b["states"]).shape == (2, 2, 3)
    assert f.min() >= -1.0 and f.max() <= 1.0
    # normalization matches the TF path exactly (full-length window => the
    # random window start is forced to 0)
    ds_full = NativeTFRecordClips(
        data_dir=str(tmp_path),
        batch=1,
        seq_len=8,
        image_size=16,
        clip_len=8,
        raw_image_size=16,
        seed=0,
    )
    f_full = np.asarray(ds_full.batch_at(0)["frames"])
    np.testing.assert_allclose(
        f_full[0, 0], frames[0, 0].astype(np.float32) / 255.0 * 2 - 1, rtol=1e-6
    )


# ---------------------------------------------------------------------------
# Wire-level parser-semantics pins (r3 review): the one-pass clip parser must
# match the r2 exact-key/clean-parse contract exactly.
# ---------------------------------------------------------------------------

from action_conditioned_gans_tpu.data.native_tfrecord import (  # noqa: E402
    _bytes_feature,
    _float_feature,
    _len_delim,
    _varint,
)


def _raw_example(entries):
    """Encode Example{features{map}} from ordered (key, raw Feature bytes)."""
    blob = b""
    for key, feat in entries:
        entry = _len_delim(1, key.encode()) + _len_delim(2, feat)
        blob += _len_delim(1, entry)
    return _len_delim(1, blob)


def _write_payloads(path, payloads):
    from action_conditioned_gans_tpu.data.native_tfrecord import load_library

    lib = load_library()
    w = lib.acgan_writer_open(path.encode())
    assert w
    for p in payloads:
        assert lib.acgan_writer_write(w, p, len(p)) == 0
    lib.acgan_writer_close(w)


def _clip_entries(t_steps=2, hw=4):
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, size=(t_steps, hw, hw, 3), dtype=np.uint8)
    entries = []
    for t in range(t_steps):
        entries.append((f"{t}/image_aux1/encoded", _bytes_feature(frames[t].tobytes())))
        entries.append((f"{t}/action", _float_feature([float(t), 1.0, 2.0, 3.0])))
        entries.append((f"{t}/endeffector_pos", _float_feature([0.1, 0.2, 0.3])))
    return frames, entries


def _read(path, t_steps=2, hw=4):
    return list(read_clips(path, n_steps=t_steps, height=hw, width=hw, encoding="raw"))


def test_zero_padded_key_does_not_alias_canonical(tmp_path):
    # "00/action" is NOT the canonical snprintf("%d/...") spelling: a garbage
    # entry under it (even map-ordered first) must not shadow "0/action".
    path = str(tmp_path / "alias.tfrecord")
    frames, entries = _clip_entries()
    garbage = ("00/action", _float_feature([99.0, 99.0, 99.0, 99.0]))
    _write_payloads(path, [_raw_example([garbage] + entries)])
    (got_f, got_a, _), = _read(path)
    np.testing.assert_array_equal(got_f, frames)
    np.testing.assert_allclose(got_a[0], [0.0, 1.0, 2.0, 3.0])


def test_only_zero_padded_key_is_missing(tmp_path):
    # A record carrying ONLY "00/action" lacks timestep 0's action entirely.
    path = str(tmp_path / "padded_only.tfrecord")
    _, entries = _clip_entries()
    entries = [
        ("00/action" if k == "0/action" else k, v) for k, v in entries
    ]
    _write_payloads(path, [_raw_example(entries)])
    with pytest.raises(ValueError, match="missing timestep 0"):
        _read(path)


def test_malformed_floatlist_tail_rejects_feature(tmp_path):
    # Enough valid packed floats followed by a truncated field: the r2
    # parser only accepted cleanly-parsed Feature messages, so this is a
    # schema error, not a silently-accepted action.
    path = str(tmp_path / "badtail.tfrecord")
    _, entries = _clip_entries()
    bad = _float_feature([9.0, 8.0, 7.0, 6.0]) + _varint((5 << 3) | 2) + _varint(100)
    entries = [(k, bad if k == "1/action" else v) for k, v in entries]
    _write_payloads(path, [_raw_example(entries)])
    with pytest.raises(ValueError, match="missing timestep 1"):
        _read(path)


def test_truncated_second_frame_value_rejects_feature(tmp_path):
    # BytesList with one valid frame then a truncated second value was an
    # error in r2 (clean-parse contract); it must not yield the first frame.
    path = str(tmp_path / "badframe.tfrecord")
    frames, entries = _clip_entries()
    bad = _len_delim(
        1,
        _len_delim(1, frames[0].tobytes()) + _varint((1 << 3) | 2) + _varint(9999),
    )
    entries = [(k, bad if k == "0/image_aux1/encoded" else v) for k, v in entries]
    _write_payloads(path, [_raw_example(entries)])
    with pytest.raises(ValueError, match="missing timestep 0"):
        _read(path)


@pytest.mark.parametrize("encoding", ["raw", "png"])
def test_parallel_decode_matches_serial(tmp_path, encoding):
    """decode_threads > 1 must yield byte-identical batches to the serial
    reader — ordered reassembly keeps the stream (and the shuffle draws,
    window rng, crop indices, and resume fast-forward keyed on it) exact.
    Covered for both the fast C parse (raw) and the PIL fallback (png)."""
    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(n=12, t=6, hw=16, seed=7)
    write_clips_tfrecord_native(path, frames, actions, states, encoding=encoding)

    def make(threads, start_batch=0):
        return NativeTFRecordClips(
            data_dir=str(tmp_path),
            batch=3,
            seq_len=3,
            image_size=12,
            clip_len=6,
            raw_image_size=16,
            crop=14,
            crop_random=True,
            shuffle_buffer=4,
            seed=3,
            start_batch=start_batch,
            decode_threads=threads,
        )

    serial, par = make(0), make(4)
    for i in range(8):
        a, b = serial.batch_at(i), par.batch_at(i)
        for key in ("frames", "actions", "states"):
            np.testing.assert_array_equal(
                np.asarray(a[key]), np.asarray(b[key]), err_msg=f"{key}@{i}"
            )

    # Resume fast-forward composes: a threads=4 reader started at batch 5
    # equals an uninterrupted serial stream at the same position.
    resumed = make(4, start_batch=5)
    serial2 = make(0)
    for i in range(5):
        serial2.batch_at(i)
    np.testing.assert_array_equal(
        np.asarray(serial2.batch_at(5)["frames"]),
        np.asarray(resumed.batch_at(0)["frames"]),
    )


def test_parallel_decode_error_position_matches_serial(tmp_path):
    """A corrupt-framing error must surface at the same stream position in
    parallel mode: the clips parsed ahead of the failure are yielded first
    (r3c review: they were silently dropped), so the consumer sees exactly
    the serial reader's prefix, then the same error."""
    path = str(tmp_path / "clips.tfrecord")
    frames, actions, states = fixture_arrays(n=10, t=4, hw=8, seed=9)
    write_clips_tfrecord_native(path, frames, actions, states)
    import os

    # Corrupt the file at 70% of its length: the reader yields the records
    # fully framed before that point, then hits a CRC/framing error.
    with open(path, "r+b") as f:
        f.seek(int(os.path.getsize(path) * 0.7))
        f.write(b"\xa5" * 64)

    def consume(threads):
        ds = NativeTFRecordClips(
            data_dir=str(tmp_path),
            batch=1,
            seq_len=2,
            image_size=8,
            clip_len=4,
            raw_image_size=8,
            seed=0,
            repeat=False,
            decode_threads=threads,
        )
        got, err = [], None
        gen = ds._records()
        try:
            for clip in gen:
                got.append(clip[0].copy())
        except IOError as e:
            err = str(e)
        return got, err

    s_clips, s_err = consume(0)
    p_clips, p_err = consume(4)
    assert s_err is not None and "corrupt" in s_err
    assert p_err == s_err
    assert len(p_clips) == len(s_clips)
    for a, b in zip(s_clips, p_clips):
        np.testing.assert_array_equal(a, b)


#!/usr/bin/env python
"""Deterministic fuzz of the native TFRecord C ABI under AddressSanitizer.

Builds an ASan variant of native/tfrecord_io.cc, then drives the parse
entry points (acgan_parse_clip / acgan_parse_clip_floats / acgan_get_bytes)
and the framing reader with: every truncation prefix of a valid Example
payload, single-byte mutations at every offset, seeded random garbage, and
corrupted/truncated record files. Zero ASan reports = pass.

Must run under the ASan runtime:

    python scripts/fuzz_native.py --build   # compile /tmp/libacgan_asan.so
    LD_PRELOAD=$(gcc -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0 \
        python scripts/fuzz_native.py

(detect_leaks=0: CPython itself "leaks" interned objects at exit.)
Last clean run recorded in docs/RUNBOOK.md (r3b: ~5,000 parser inputs +
~900 framing corruptions, no findings).
"""

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ASAN_SO = "/tmp/libacgan_asan.so"


def build():
    subprocess.run(
        [
            "g++",
            "-O1",
            "-g",
            "-std=c++17",
            "-fPIC",
            "-Wall",
            "-Wextra",
            "-fsanitize=address",
            "-shared",
            "-o",
            ASAN_SO,
            os.path.join(REPO, "native", "tfrecord_io.cc"),
        ],
        check=True,
    )
    print(f"built {ASAN_SO}")


def main():
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        declare_api,
        encode_example,
    )

    # The production binding's declarations, applied to the ASan build —
    # the fuzzer must exercise exactly the call signatures production uses.
    lib = declare_api(ctypes.CDLL(ASAN_SO))

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    feats = {}
    for t in range(2):
        feats[f"{t}/image_aux1/encoded"] = frames[t].tobytes()
        feats[f"{t}/action"] = [float(t), 1.0, 2.0, 3.0]
        feats[f"{t}/endeffector_pos"] = [0.1, 0.2, 0.3]
    payload = bytearray(encode_example(feats))
    n = len(payload)

    f_out = np.empty((2, 8, 8, 3), np.uint8)
    a_out = np.empty((2, 4), np.float32)
    s_out = np.empty((2, 3), np.float32)
    ptr = ctypes.POINTER(ctypes.c_uint8)()
    ln = ctypes.c_uint64()

    def drive(buf):
        b = (
            (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf)
            if buf
            else (ctypes.c_uint8 * 1)()
        )
        lib.acgan_parse_clip(
            b,
            len(buf),
            2,
            b"image_aux1",
            192,
            f_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            a_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            4,
            s_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            3,
        )
        lib.acgan_parse_clip_floats(
            b,
            len(buf),
            2,
            a_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            4,
            s_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            3,
        )
        lib.acgan_get_bytes(
            b, len(buf), b"0/image_aux1/encoded", ctypes.byref(ptr), ctypes.byref(ln)
        )

    for cut in range(n + 1):  # every truncation prefix
        drive(bytes(payload[:cut]))
    for off in range(n):  # single-byte mutations
        for v in (0x00, 0xFF, 0x80, payload[off] ^ 0x5A):
            m = bytearray(payload)
            m[off] = v
            drive(bytes(m))
    for _ in range(2000):  # random garbage
        drive(rng.bytes(rng.randint(0, 400)))
    print(f"parser fuzz OK ({n + 1} prefixes, {4 * n} mutations, 2000 random)")

    # Framing reader over corrupted files.
    d = tempfile.mkdtemp()
    fpath = os.path.join(d, "fz.tfrecord")
    w = lib.acgan_writer_open(fpath.encode())
    for _ in range(3):
        assert lib.acgan_writer_write(w, bytes(payload), n) == 0
    lib.acgan_writer_close(w)
    with open(fpath, "rb") as f:
        blob = f.read()

    def drive_file(content):
        with open(fpath, "wb") as f:
            f.write(content)
        r = lib.acgan_reader_open(fpath.encode())
        if not r:
            return
        data = ctypes.POINTER(ctypes.c_uint8)()
        while lib.acgan_reader_next(r, ctypes.byref(data)) > 0:
            pass
        lib.acgan_reader_close(r)

    for cut in range(0, len(blob) + 1, 7):
        drive_file(blob[:cut])
    for off in range(0, len(blob), 3):
        m = bytearray(blob)
        m[off] ^= 0xA5
        drive_file(bytes(m))
    print(f"framing fuzz OK ({len(blob)} file bytes)")
    print("FUZZ CLEAN: no ASan report")


if __name__ == "__main__":
    if "--build" in sys.argv:
        build()
    else:
        if not os.path.exists(ASAN_SO):
            build()
        main()

"""Crop-stage helpers shared by BOTH file readers.

The reference input transform is "frame decode -> crop/resize -> normalize"
(SURVEY.md §1 capability 1, BASELINE.json north_star). The crop is taken
from the raw stored frame BEFORE the resize, with ONE offset per clip (all
frames of a clip crop identically — temporal consistency is what makes the
crop usable for video prediction).

Random offsets are drawn from a stateless splitmix64 hash keyed on
``(seed, stream index)`` — pure integer math implementable identically in
numpy (native reader) and via ``tf.numpy_function`` (tf.data reader), so
the two file readers produce byte-identical crops from the same records and
seed (the cross-reader alignment contract, tests/test_crop.py).
"""

from __future__ import annotations

from typing import Tuple

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return (x ^ (x >> 31)) & _M64


def crop_offsets(
    seed: int, index: int, raw: int, crop: int, random: bool
) -> Tuple[int, int]:
    """(oy, ox) top-left corner of a ``crop`` x ``crop`` window in a
    ``raw`` x ``raw`` frame. ``index`` is the clip's absolute position in
    the (deterministic) stream, so crops survive resume fast-forward."""
    if crop <= 0 or crop > raw:
        raise ValueError(f"crop={crop} must be in [1, raw={raw}]")
    span = raw - crop + 1
    if not random or span == 1:
        off = (raw - crop) // 2
        return off, off
    z = _splitmix64(_splitmix64(seed & _M64) ^ (index & _M64))
    return int(z % span), int((z >> 32) % span)


def crop_offsets_tf(seed: int, index, raw: int, crop: int, random: bool):
    """Graph-mode twin of ``crop_offsets`` for the tf.data reader: the same
    splitmix64 in TF uint64 ops, so the map stage stays parallel (the
    previous ``tf.numpy_function`` round-trip held the GIL per clip — r3
    review). Returns an int64 (2,) tensor (oy, ox); ``index`` is a scalar
    int tensor. Bit-for-bit equality with ``crop_offsets`` is pinned by
    tests/test_crop.py."""
    import tensorflow as tf

    if crop <= 0 or crop > raw:
        raise ValueError(f"crop={crop} must be in [1, raw={raw}]")
    span = raw - crop + 1
    if not random or span == 1:
        off = (raw - crop) // 2
        return tf.constant([off, off], tf.int64)

    def u64(v):
        return tf.constant(v & _M64, tf.uint64)

    def sm64(x):
        x = x + u64(0x9E3779B97F4A7C15)
        x = tf.bitwise.bitwise_xor(x, tf.bitwise.right_shift(x, u64(30)))
        x = x * u64(0xBF58476D1CE4E5B9)
        x = tf.bitwise.bitwise_xor(x, tf.bitwise.right_shift(x, u64(27)))
        x = x * u64(0x94D049BB133111EB)
        return tf.bitwise.bitwise_xor(x, tf.bitwise.right_shift(x, u64(31)))

    z = sm64(tf.bitwise.bitwise_xor(sm64(u64(seed)), tf.cast(index, tf.uint64)))
    oy = z % u64(span)
    ox = tf.bitwise.right_shift(z, u64(32)) % u64(span)
    return tf.cast(tf.stack([oy, ox]), tf.int64)

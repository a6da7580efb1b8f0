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

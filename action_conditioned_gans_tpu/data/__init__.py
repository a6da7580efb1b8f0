"""Data pipeline (SURVEY.md §3 row 2, §4.3).

The reference reads BAIR-robot-pushing TFRecords through TF1 queue runners:
decode -> crop/resize -> [0,1] -> [-1,1] -> slice (frame_t, action_t,
frame_{t+1}) triples. The rebuild provides:

* ``synthetic`` — a seeded, fully on-device pushing-clip generator (pure
  JAX, jit-compiled; zero host<->device traffic per batch), the data source
  for the BASELINE.json benchmark configs;
* ``tfrecord`` — a BAIR-style TFRecord reader (tf.data on the host) with the
  same decode/resize/normalize/action-pack semantics, double-buffered onto
  the device.

Both emit the unified clip batch: ``frames`` (B, T+1, H, W, C) in [-1, 1],
``actions`` (B, T, A), and optionally ``states`` (B, T, S).
"""

from action_conditioned_gans_tpu.data.synthetic import SyntheticClips, generate_clips
from action_conditioned_gans_tpu.data.pipeline import make_dataset

__all__ = ["SyntheticClips", "generate_clips", "make_dataset"]

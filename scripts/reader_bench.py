#!/usr/bin/env python
"""Host-side input-pipeline throughput: native C++ reader vs tf.data.

Generates a BAIR-shaped TFRecord fixture (uint8 frames + float action/state
features per timestep), then measures end-to-end clip decode throughput for
both readers (SURVEY.md §3: the reference's input path is TF queue-runners;
the rebuild ships a tf.data reader AND a dependency-free native C++ reader —
this script quantifies the native path's value for toolchains without TF).

Pure host benchmark — it FORCES the CPU platform before any jax import so
the tunneled TPU never enters the measurement (the readers' place_batch
lands batches on the default device; on the axon tunnel even a scalar fetch
can compile through the flaky remote helper and hang — observed r2).

Usage: python scripts/reader_bench.py [num_clips] [clip_len]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

NUM_CLIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
CLIP_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 30
SIZE = 64


def main() -> int:
    from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from action_conditioned_gans_tpu.data.native_tfrecord import (
        write_clips_tfrecord_native,
    )

    rng = np.random.RandomState(0)
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "clips.tfrecord")
        frames = rng.randint(0, 256, size=(NUM_CLIPS, CLIP_LEN, SIZE, SIZE, 3), dtype=np.uint8)
        actions = rng.randn(NUM_CLIPS, CLIP_LEN, 4).astype(np.float32)
        states = rng.randn(NUM_CLIPS, CLIP_LEN, 3).astype(np.float32)
        write_clips_tfrecord_native(path, frames, actions, states)
        file_mb = os.path.getsize(path) / 1e6
        out["fixture"] = {"clips": NUM_CLIPS, "clip_len": CLIP_LEN, "file_mb": round(file_mb, 1)}

        cfg = Config(
            name="reader-bench",
            model=ModelConfig(image_size=SIZE, state_dim=3),
            data=DataConfig(
                data_dir=tmp, seq_len=CLIP_LEN, clip_len=CLIP_LEN, raw_image_size=SIZE
            ),
            train=TrainConfig(batch_size=8),
        )

        def measure(source: str, decode_threads: int = 0):
            import dataclasses

            from action_conditioned_gans_tpu.data import make_dataset

            c = dataclasses.replace(
                cfg,
                data=dataclasses.replace(
                    cfg.data, source=source, decode_threads=decode_threads
                ),
            )
            ds = make_dataset(c)
            n_batches = NUM_CLIPS // cfg.train.batch_size
            if n_batches < 2:
                raise SystemExit(
                    f"need at least {2 * cfg.train.batch_size} clips to time "
                    f"one post-warmup batch (got {NUM_CLIPS})"
                )
            ds.batch_at(0)  # warm (file open, thread spin-up, tf graph build)
            t0 = time.perf_counter()
            for i in range(1, n_batches):
                b = ds.batch_at(i)
            np.asarray(b["frames"][0, 0, 0, 0])  # materialize
            dt = time.perf_counter() - t0
            close = getattr(ds, "close", None)
            if close:
                close()
            clips = (n_batches - 1) * cfg.train.batch_size
            return {
                "clips_per_sec": round(clips / dt, 1),
                "frames_per_sec": round(clips * CLIP_LEN / dt, 1),
                "mb_per_sec": round(clips / NUM_CLIPS * file_mb / dt, 1),
            }

        out["native_cc"] = measure("tfrecord_native")
        # Parallel decode (DataConfig.decode_threads): on a multi-core host
        # the C parse + PIL run concurrently; on this 1-core container it
        # only shows the ordered-map overhead is small.
        threads = max(2, os.cpu_count() or 2)
        out[f"native_cc_threads{threads}"] = measure("tfrecord_native", threads)
        try:
            out["tf_data"] = measure("tfrecord")
        except Exception as e:
            out["tf_data"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

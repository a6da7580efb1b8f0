"""Metric writing (SURVEY.md §6): stdout + optional TensorBoard.

The two BASELINE.json metrics — frames/sec/chip for the fused G+D step and
p50 per-step latency — are first-class here: ``MetricWriter.timing`` keeps a
rolling latency window and derives both.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Dict, Optional


class MetricWriter:
    """Scalar metric sink: stdout JSON lines + optional TF summary files.

    TensorBoard writing is gated on tensorflow being importable so the core
    framework has no hard TF dependency.
    """

    def __init__(self, logdir: Optional[str] = None, latency_window: int = 200):
        self._tb = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            try:
                import tensorflow as tf  # type: ignore

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None
        self._latencies = deque(maxlen=latency_window)
        self._last_t: Optional[float] = None

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        record = {"step": int(step)}
        record.update({k: float(v) for k, v in metrics.items()})
        print(json.dumps(record), flush=True)
        if self._tb is not None:
            import tensorflow as tf  # type: ignore

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def write_images(self, step: int, tag: str, images) -> None:
        """Image summaries (the reference's periodic tf.summary images,
        SURVEY.md §6). ``images``: (N, H, W, C) in [-1, 1]; no-op without a
        TensorBoard writer."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf  # type: ignore

        arr = (np.clip(np.asarray(images, np.float32), -1, 1) + 1.0) / 2.0
        with self._tb.as_default():
            tf.summary.image(tag, arr, step=int(step), max_outputs=arr.shape[0])

    # --- step timing -------------------------------------------------------
    def tick(self) -> None:
        """Mark the completion of one training step (call after blocking on
        the step's outputs)."""
        now = time.perf_counter()
        if self._last_t is not None:
            self._latencies.append(now - self._last_t)
        self._last_t = now

    def reset_timing(self) -> None:
        self._latencies.clear()
        self._last_t = None

    def p50_latency(self) -> Optional[float]:
        if not self._latencies:
            return None
        xs = sorted(self._latencies)
        return xs[len(xs) // 2]

    def frames_per_sec(self, frames_per_step: int, num_chips: int = 1) -> Optional[float]:
        p50 = self.p50_latency()
        if not p50:
            return None
        return frames_per_step / p50 / max(num_chips, 1)

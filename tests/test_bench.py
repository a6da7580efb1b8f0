"""Bench harness tests (CPU): the windowed-throughput measurement runs and
reports sane fields on a tiny config."""

import dataclasses

import numpy as np

from action_conditioned_gans_tpu.bench import run_bench
from action_conditioned_gans_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig


def test_run_bench_tiny():
    cfg = Config(
        name="tiny-bench",
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
        train=TrainConfig(batch_size=2),
        mesh=MeshConfig(data=1),
    )
    stats = run_bench(cfg, steps=3, warmup=1)
    assert stats["config"] == "tiny-bench"
    assert stats["p50_step_latency_ms"] > 0
    assert stats["frames_per_sec_per_chip"] > 0
    assert np.isfinite(stats["compile_s"])
    assert stats["num_chips"] == 1

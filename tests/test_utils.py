"""Utils coverage: image grid math, metric writer timing."""

import json

import numpy as np

from action_conditioned_gans_tpu.utils.images import frames_to_uint8, tile_grid
from action_conditioned_gans_tpu.utils.metrics import MetricWriter


def test_frames_to_uint8_range_and_values():
    x = np.array([[-1.0, 0.0, 1.0]], np.float32).reshape(1, 1, 3, 1)
    u = frames_to_uint8(x)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u.reshape(-1), [0, 128, 255])
    # out-of-range values clip
    u2 = frames_to_uint8(np.full((1, 1, 1, 1), 5.0))
    assert u2.reshape(-1)[0] == 255


def test_tile_grid_layout():
    imgs = np.arange(6, dtype=np.uint8).reshape(6, 1, 1, 1) * 10
    grid = tile_grid(imgs, cols=3)
    assert grid.shape == (2, 3, 1)
    np.testing.assert_array_equal(grid[0, :, 0], [0, 10, 20])
    np.testing.assert_array_equal(grid[1, :, 0], [30, 40, 50])


def test_tile_grid_pads_ragged():
    imgs = np.ones((5, 2, 2, 3), np.uint8)
    grid = tile_grid(imgs, cols=2)
    assert grid.shape == (6, 4, 3)  # 3 rows x 2 cols, last slot zero
    assert grid[4:, 2:].sum() == 0


def test_metric_writer_stdout_and_timing(capsys):
    w = MetricWriter(logdir=None)
    w.write(3, {"loss": 1.5})
    line = capsys.readouterr().out.strip()
    assert json.loads(line) == {"step": 3, "loss": 1.5}

    assert w.p50_latency() is None
    for _ in range(5):
        w.tick()
    assert w.p50_latency() is not None and w.p50_latency() >= 0
    assert w.frames_per_sec(frames_per_step=10, num_chips=2) > 0
    w.reset_timing()
    assert w.p50_latency() is None

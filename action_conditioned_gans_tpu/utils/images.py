"""Image/GIF export for sampling and eval (SURVEY.md §3 row 8).

The reference tiles sampled frames into PNG grids and GIFs for visual
inspection; same here, via PIL (host-side, eval-only — never on the training
hot path).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def frames_to_uint8(frames) -> np.ndarray:
    """[-1, 1] float frames -> uint8, any leading batch/time dims kept."""
    x = np.asarray(frames, dtype=np.float32)
    x = (np.clip(x, -1.0, 1.0) + 1.0) * 127.5
    return np.round(x).astype(np.uint8)


def tile_grid(images: np.ndarray, cols: int = 8) -> np.ndarray:
    """(N, H, W, C) uint8 -> one tiled (rows*H, cols*W, C) grid image."""
    n, h, w, c = images.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w, c), dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    return grid


def save_image_grid(path: str, images, cols: int = 8) -> None:
    """Save (N, H, W, C) frames in [-1, 1] as one tiled PNG."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    grid = tile_grid(frames_to_uint8(images), cols)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)


def save_gif(path: str, clip, fps: int = 5) -> None:
    """Save a (T, H, W, C) clip in [-1, 1] as an animated GIF."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    frames = frames_to_uint8(clip)
    imgs = [Image.fromarray(f if f.shape[-1] != 1 else f[..., 0]) for f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )


def save_rollout_strip(path: str, gt_clip, pred_clip) -> None:
    """Two-row comparison strip: ground truth (top) vs prediction (bottom),
    time along the horizontal axis. Shapes (T, H, W, C) in [-1, 1]."""
    gt = frames_to_uint8(gt_clip)
    pred = frames_to_uint8(pred_clip)
    t, h, w, c = gt.shape
    strip = np.concatenate(
        [np.concatenate(list(gt), axis=1), np.concatenate(list(pred), axis=1)], axis=0
    )
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(strip if c != 1 else strip[..., 0]).save(path)

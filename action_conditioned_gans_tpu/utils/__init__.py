"""Auxiliary subsystems (SURVEY.md §6): checkpoint/resume, metrics,
image/GIF export, profiling."""

from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager
from action_conditioned_gans_tpu.utils.metrics import MetricWriter
from action_conditioned_gans_tpu.utils.images import frames_to_uint8, save_gif, save_image_grid

__all__ = [
    "CheckpointManager",
    "MetricWriter",
    "frames_to_uint8",
    "save_gif",
    "save_image_grid",
]

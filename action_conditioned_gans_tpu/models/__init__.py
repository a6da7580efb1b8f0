"""Model family: action-conditioned generator + conditional discriminator
(SURVEY.md §3 rows 4-5)."""

from action_conditioned_gans_tpu.models.common import tile_condition
from action_conditioned_gans_tpu.models.discriminator import Discriminator
from action_conditioned_gans_tpu.models.generator import Generator

__all__ = ["Generator", "Discriminator", "tile_condition"]

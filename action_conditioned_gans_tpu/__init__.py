"""action_conditioned_gans_tpu — a TPU-native action-conditioned video-prediction GAN framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
``yidingjiang/action_conditioned_GANs`` (see SURVEY.md; the reference mount
was empty at survey time, so the binding spec is SURVEY.md + BASELINE.json):

* video input path: decode -> crop/resize -> [-1, 1] normalize -> per-timestep
  action packing, fused and device-resident (``data/``),
* conv encoder + spatially-tiled action conditioning + conv-transpose decoder
  generator, strided-conv LeakyReLU discriminator (``models/``),
* fused Pallas conv/norm/activation kernels with a plain-XLA fallback
  (``ops/``),
* a single jitted fused G+D training step with two optax optimizers and
  data-parallel ``psum`` gradients over a ``jax.sharding.Mesh`` (``train/``,
  ``parallel/``),
* orbax checkpointing, metric writing, profiling, sampling/GIF export
  (``utils/``).
"""

from action_conditioned_gans_tpu import config as config
from action_conditioned_gans_tpu.config import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    get_preset,
    PRESETS,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "get_preset",
    "PRESETS",
    "config",
]

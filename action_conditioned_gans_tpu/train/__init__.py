"""Training: fused G+D jitted step, losses, rollouts, host loop.

The reference runs two separate ``sess.run`` dispatches per iteration
(SURVEY.md §4.1); here both updates compile into ONE jitted function — the
BASELINE.json "single jitted update" requirement — with sequential
semantics inside the trace (D updates first, G's adversarial gradient is
taken against the *updated* D), matching the reference's alternating
dynamics while paying a single dispatch.
"""

from action_conditioned_gans_tpu.train.losses import (
    discriminator_loss,
    generator_adv_loss,
    reconstruction_loss,
)
from action_conditioned_gans_tpu.train.state import TrainState, init_state, make_optimizers
from action_conditioned_gans_tpu.train.step import make_train_step
from action_conditioned_gans_tpu.train.rollout import rollout_generator, scheduled_sampling_prob

__all__ = [
    "TrainState",
    "init_state",
    "make_optimizers",
    "make_train_step",
    "rollout_generator",
    "scheduled_sampling_prob",
    "discriminator_loss",
    "generator_adv_loss",
    "reconstruction_loss",
]

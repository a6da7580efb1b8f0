"""Parallelism (SURVEY.md §3 parallelism table — all new TPU-native design;
the reference is single-device).

* ``mesh``  — ``jax.sharding.Mesh`` construction over ('data', 'model') and
  sharding helpers.
* ``dp``    — explicit data parallelism: ``shard_map`` over the data axis
  with ``psum``/``pmean`` gradient reduction inside the fused step (the
  BASELINE.json requirement). Collectives compile to ICI transfers
  intra-slice and DCN inter-slice; nothing NCCL-like is needed.
* ``gspmd`` — compiler-driven dp x tp: params annotated with
  ``NamedSharding`` (conv output channels on the 'model' axis), XLA GSPMD
  inserts the all-reduces/all-gathers.

PP, SP(ring/Ulysses), and EP are deliberately N/A for this model family
(~10 conv layers, no attention, no MoE; SURVEY.md §3). The rollout time
axis is lax.scan, not a sharded dimension (SURVEY.md §6).
"""

from action_conditioned_gans_tpu.parallel.mesh import (
    batch_pspec,
    make_mesh,
    replicated,
    shard_batch,
)
from action_conditioned_gans_tpu.parallel.dp import make_dp_train_step
from action_conditioned_gans_tpu.parallel.gspmd import (
    make_gspmd_train_step,
    state_shardings,
    tp_param_pspec,
)

__all__ = [
    "make_mesh",
    "batch_pspec",
    "replicated",
    "shard_batch",
    "make_dp_train_step",
    "make_gspmd_train_step",
    "state_shardings",
    "tp_param_pspec",
]

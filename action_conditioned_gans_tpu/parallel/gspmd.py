"""Compiler-driven dp x tp sharding (GSPMD / pjit path).

Tensor parallelism for this model family means sharding conv channels
(SURVEY.md §3: "shard conv channels at 128x128/256x256 resolutions if
per-chip HBM is exceeded"). Following the scaling-book recipe: pick the
mesh, annotate parameter shardings, and let XLA insert the collectives —
conv kernels shard their output-channel dim over 'model', per-channel
norm params follow, everything else (and every param under DP) is
replicated; the batch shards over 'data'. XLA GSPMD propagates the channel
sharding through the network and inserts the reduce/all-gather ops on ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.parallel.mesh import batch_pspec
from action_conditioned_gans_tpu.train.state import TrainState
from action_conditioned_gans_tpu.train.step import make_multi_train_step


def tp_param_pspec(leaf: jax.ShapeDtypeStruct, model_axis: str, model_size: int) -> P:
    """Sharding rule for one parameter leaf.

    Conv kernels (rank 4, HWIO) shard output channels; per-channel vectors
    (rank 1) shard their only dim; anything indivisible is replicated. The
    embedding-free, attention-free model needs nothing fancier.
    """
    shape = leaf.shape
    if model_size <= 1:
        return P()
    if len(shape) == 4 and shape[-1] % model_size == 0 and shape[-1] >= 2 * model_size:
        return P(None, None, None, model_axis)
    if len(shape) == 1 and shape[0] % model_size == 0 and shape[0] >= 2 * model_size:
        return P(model_axis)
    return P()


def state_shardings(state_shape: Any, mesh: Mesh):
    """NamedSharding pytree for a TrainState (params TP-sharded, optimizer
    states following their params, scalars replicated)."""
    model_axis = mesh.axis_names[1]
    model_size = mesh.shape[model_axis]

    def leaf_sharding(leaf):
        if not hasattr(leaf, "shape") or len(getattr(leaf, "shape", ())) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, tp_param_pspec(leaf, model_axis, model_size))

    return jax.tree_util.tree_map(leaf_sharding, state_shape)


def make_gspmd_train_step(cfg: Config, mesh: Mesh, state_example: TrainState):
    """Jit the fused step with explicit in/out shardings over the dp x tp mesh.

    No axis_name is threaded into the step: gradient reduction over 'data'
    and channel collectives over 'model' are both inserted by GSPMD from the
    sharding annotations.
    """
    step = make_multi_train_step(cfg, axis_name=None)

    state_shape = jax.tree_util.tree_map(
        # result_type reads dtype metadata without forcing host numpy leaves
        # (e.g. a just-restored checkpoint) onto the default device.
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        state_example,
    )
    st_shardings = state_shardings(state_shape, mesh)
    batch_sharding = NamedSharding(
        mesh, batch_pspec(mesh, cfg.train.steps_per_call > 1)
    )
    rng_sharding = NamedSharding(mesh, P())
    metrics_sharding = NamedSharding(mesh, P())

    return jax.jit(
        step,
        in_shardings=(st_shardings, batch_sharding, rng_sharding),
        out_shardings=(st_shardings, metrics_sharding),
        donate_argnums=(0,),
    )

"""Explicit data parallelism: shard_map + psum inside the fused step.

This is the primary scaling path (SURVEY.md §3: DP is first-class). The
fused G+D step runs per-device on the local batch shard; gradients and
metrics are ``pmean``-reduced over the 'data' mesh axis *inside* the same
trace, so the whole iteration — rollout, both loss/grad computations, both
Adam updates, the cross-device all-reduce — is one XLA executable with the
collectives scheduled on ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.parallel.mesh import batch_pspec
from action_conditioned_gans_tpu.train.step import make_multi_train_step


def make_dp_train_step(cfg: Config, mesh: Mesh):
    """Jitted data-parallel fused step: (state, batch, rng) -> (state, metrics).

    State is replicated (PartitionSpec()), the batch is sharded on its
    batch axis over 'data', and the returned state/metrics are replicated
    (valid because grads/metrics are pmean'd before use). With
    steps_per_call > 1 the batch carries a leading (k, ...) steps axis (not
    sharded) and k sequential updates run per dispatch.
    """
    data_axis = mesh.axis_names[0]
    n_data = mesh.shape[data_axis]
    if cfg.train.batch_size % n_data:
        raise ValueError(
            f"train.batch_size={cfg.train.batch_size} must be divisible by "
            f"the data mesh axis ({n_data} devices)"
        )
    for extra in mesh.axis_names[1:]:
        if mesh.shape[extra] > 1:
            # shard_map DP only reduces over 'data'; a model axis > 1 would
            # silently run identical replicas at full cost on every model
            # shard. TP meshes belong to make_gspmd_train_step.
            raise ValueError(
                f"make_dp_train_step got a mesh with {extra}="
                f"{mesh.shape[extra]} > 1; use make_gspmd_train_step for "
                "dp x tp meshes"
            )
    step = make_multi_train_step(cfg, axis_name=data_axis)
    batch_spec = batch_pspec(mesh, cfg.train.steps_per_call > 1)

    # check_vma verifies the out_specs=P() replication claim (every grad and
    # metric really was pmean'd) — keep it ON for the default path so a
    # future un-reduced value fails loudly instead of silently diverging
    # per shard. pallas_call cannot carry the vma annotation on its
    # ShapeDtypeStruct outputs, so Pallas-containing configs must opt out;
    # likewise ANY custom_vjp engine (wgrad="patches", gn_backward="fused"):
    # their cotangents hit a jax vma bookkeeping gap in scan transposes
    # ("Scan carry input and output got mismatched varying manual axes",
    # which jax itself says to work around with check_vma=False).
    uses_pallas = cfg.model.backend == "pallas" or cfg.model.gn_backward == "pallas"
    uses_custom_vjp = (
        uses_pallas
        or cfg.model.wgrad == "patches"
        or cfg.model.gn_backward == "fused"
    )
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=not uses_custom_vjp,
    )
    return jax.jit(sharded, donate_argnums=(0,))

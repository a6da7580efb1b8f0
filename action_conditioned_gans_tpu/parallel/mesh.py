"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from action_conditioned_gans_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ('data', 'model') mesh.

    ``cfg.data == -1`` uses every available device on the data axis (after
    dividing out the model axis). Device order comes from
    ``jax.devices()``, which JAX already orders for ICI locality; multi-slice
    (v5e-16 across hosts, BASELINE.json config 5) keeps DP traffic on
    ICI within a slice and only gradient all-reduce on DCN.
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    model = max(cfg.model, 1)
    if cfg.data == -1:
        # Divisibility only matters for auto-division; an explicit
        # data x model grid merely needs enough devices (e.g. 2x3 on 8).
        if len(devices) % model:
            raise ValueError(
                f"{len(devices)} devices not divisible by model={model}"
            )
        data = len(devices) // model
    else:
        data = cfg.data
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {len(devices)}"
        )
    arr = _arrange(devices, data, model, explicit)
    return Mesh(arr, cfg.axis_names)


def _arrange(devices, data: int, model: int, explicit: bool) -> np.ndarray:
    """ICI-topology-aware device layout for the (data, model) grid.

    On real TPU topologies ``mesh_utils.create_device_mesh`` places the
    inner ('model') axis on physically adjacent chips so TP collectives ride
    single-hop ICI links, and ``create_hybrid_device_mesh`` keeps each slice's
    devices contiguous on the data axis so only the gradient all-reduce
    crosses DCN (multi-slice v5e-16, BASELINE.json config 5). Both fall back
    to a plain reshape of enumeration order when the topology is unknown
    (CPU/virtual meshes, explicit device subsets in tests).
    """
    if not explicit and data * model == len(devices):
        from jax.experimental import mesh_utils

        n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        try:
            if n_slices > 1 and data % n_slices == 0:
                return mesh_utils.create_hybrid_device_mesh(
                    (data // n_slices, model),
                    (n_slices, 1),
                    devices=devices,
                )
            return mesh_utils.create_device_mesh((data, model), devices=devices)
        except Exception as e:
            # Expected for virtual/CPU meshes (no physical topology). On
            # real TPUs a silent fall-through would cost ICI adjacency with
            # no diagnostic, so say so.
            if devices and getattr(devices[0], "platform", "") == "tpu":
                import warnings

                warnings.warn(
                    f"mesh_utils placement failed on TPU devices ({e}); "
                    "falling back to enumeration-order layout — TP/DP "
                    "collectives may cross non-adjacent chips"
                )
    return np.array(devices[: data * model]).reshape(data, model)


def batch_pspec(mesh: Mesh, stacked: bool = False) -> P:
    """PartitionSpec for a clip batch: the batch dim shards over the data
    axis. ``stacked=True`` for (k, B, ...) multi-step batches
    (train.steps_per_call > 1) — the leading steps axis stays unsharded.
    THE single source of the batch layout; the dp/gspmd step builders and
    train.loop all derive from here (r3 review: three hand-written copies
    plus a k-unaware helper had already diverged)."""
    axis = mesh.axis_names[0]
    return P(None, axis) if stacked else P(axis)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, stacked: bool = False):
    """Place a host batch into its data-parallel device layout (see
    ``batch_pspec`` for the ``stacked`` contract)."""
    sharding = NamedSharding(mesh, batch_pspec(mesh, stacked))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

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
    devices = list(devices if devices is not None else jax.devices())
    model = max(cfg.model, 1)
    if len(devices) % model:
        raise ValueError(f"{len(devices)} devices not divisible by model={model}")
    data = cfg.data if cfg.data != -1 else len(devices) // model
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {len(devices)}"
        )
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def batch_pspec(mesh: Mesh) -> P:
    """Batches shard their leading (batch) dim over the data axis."""
    return P(mesh.axis_names[0])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch into its data-parallel device layout."""
    sharding = NamedSharding(mesh, batch_pspec(mesh))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

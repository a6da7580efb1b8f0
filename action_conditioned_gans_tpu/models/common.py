"""Shared model building blocks."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from action_conditioned_gans_tpu import ops


def tile_condition(
    action: jax.Array,
    state: Optional[jax.Array],
    height: int,
    width: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Spatially tile the conditioning vector to an (B, H, W, A[+S]) map.

    This is the signature op of the reference (SURVEY.md §4.1: "tile(action)
    -> [B, 8, 8, 4]; concat"): the low-dimensional action (and optionally the
    3-dim end-effector state, BASELINE.json config 4) is broadcast across the
    spatial grid so it can be concatenated with conv feature maps.
    """
    cond = action if state is None else jnp.concatenate([action, state], axis=-1)
    cond = cond.astype(dtype)
    b, a = cond.shape
    return jnp.broadcast_to(cond[:, None, None, :], (b, height, width, a))


class ConvBlock(nn.Module):
    """conv -> norm -> activation, with optional fused-Pallas backend.

    The norm scale/bias double as the conv bias (a bias before a mean-removing
    norm is redundant), so with norm="none" the bias comes from the norm
    params — matching the reference's conv+batch_norm stacking.
    """

    features: int
    kernel: int = 4
    stride: int = 2
    norm: str = "group"
    groups: int = 32
    act: str = "lrelu"
    leak: float = 0.2
    transpose: bool = False
    backend: str = "xla"
    gn_backward: str = "ad"
    wgrad: str = "xla"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.kernel, self.kernel, in_ch, self.features),
            jnp.float32,
        )
        scale = (
            self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            if self.norm != "none"
            else None
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return ops.conv_norm_act(
            x,
            w,
            scale,
            bias,
            stride=self.stride,
            transpose=self.transpose,
            kind=self.norm,
            groups=self.groups,
            act=self.act,
            leak=self.leak,
            axis_name=self.axis_name,
            backend=self.backend,
            gn_backward=self.gn_backward,
            wgrad=self.wgrad,
        )


def channels_at(level: int, base: int, cap: int) -> int:
    return min(base * (2**level), cap)

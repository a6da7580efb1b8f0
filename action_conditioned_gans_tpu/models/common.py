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


def spectral_normalize(w: jax.Array, iters: int = 9) -> jax.Array:
    """Divide ``w`` by its largest singular value (spectral normalization,
    Miyato et al. 2018), estimated by power iteration.

    STATELESS by design: classic SN persists the iteration vector ``u``
    across steps (1 iteration/step); persisting it here would add a mutable
    variable collection through the pure-params TrainState, the checkpoint
    layout, and the TP sharding rules. Instead the iteration restarts every
    call from a deterministic vector and runs ``iters`` times — parameters
    move slowly, the per-layer cost is a few matvecs (micro vs the conv
    itself), and the estimate is reproducible (no hidden state, resume-
    exact). Conv kernels (H, K, I, O) flatten to (H·K·I, O); gradients take
    the standard form dσ/dW = u vᵀ via stop-gradiented u, v.
    """
    shape = w.shape
    w2d = w.reshape(-1, shape[-1]).astype(jnp.float32)
    m = w2d.shape[0]
    u = jnp.full((m,), 1.0 / jnp.sqrt(jnp.asarray(m, jnp.float32)), jnp.float32)
    eps = 1e-12
    for _ in range(iters):
        v = w2d.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w2d @ v
        u = u / (jnp.linalg.norm(u) + eps)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w2d @ v)
    return (w2d / (sigma + eps)).reshape(shape).astype(w.dtype)


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
    deconv: str = "xla"
    # Strided-conv engine for THIS block ("xla" | "s2d"); the models set it
    # to ModelConfig.conv0 on their level-0 (image-adjacent) convs only.
    conv: str = "xla"
    axis_name: Optional[str] = None
    # Spectral normalization of the kernel (see spectral_normalize): used
    # by the discriminator when ModelConfig.d_spectral_norm is on.
    spectral_norm: bool = False
    sn_iters: int = 9

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.kernel, self.kernel, in_ch, self.features),
            jnp.float32,
        )
        if self.spectral_norm:
            w = spectral_normalize(w, self.sn_iters)
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
            deconv=self.deconv,
            conv=self.conv,
        )


def channels_at(level: int, base: int, cap: int) -> int:
    return min(base * (2**level), cap)

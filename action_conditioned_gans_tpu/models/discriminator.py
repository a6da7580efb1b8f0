"""Conditional discriminator.

Capability parity with the reference discriminator (SURVEY.md §3 row 5):
strided-conv stack with LeakyReLU, flatten -> linear -> single real/fake
logit. Conditioning follows the reference genre (SURVEY.md §4.1 "frame
pair"): the candidate next frame is concatenated channel-wise with the
current frame and (optionally) the spatially-tiled action, so D judges the
*transition*, not just the frame.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from action_conditioned_gans_tpu import ops
from action_conditioned_gans_tpu.config import ModelConfig
from action_conditioned_gans_tpu.models.common import ConvBlock, channels_at, tile_condition


class Discriminator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        next_frame: jax.Array,
        frame: Optional[jax.Array] = None,
        action: Optional[jax.Array] = None,
        state: Optional[jax.Array] = None,
        *,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        """next_frame: (B, H, W, C) candidate; frame/action/state: conditioning.

        Returns (B,) real/fake logits.
        """
        cfg = self.cfg
        x = next_frame.astype(cfg.dtype)
        parts = [x]
        if cfg.d_condition_frame:
            if frame is None:
                raise ValueError("d_condition_frame=True requires the current frame")
            parts.append(frame.astype(cfg.dtype))
        if cfg.d_condition_action:
            if action is None:
                raise ValueError("d_condition_action=True requires the action")
            h, w = x.shape[1], x.shape[2]
            parts.append(tile_condition(action, state, h, w, dtype=cfg.dtype))
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x

        for i in range(cfg.d_levels):
            ch = channels_at(i, cfg.d_base_channels, cfg.d_max_channels)
            x = ConvBlock(
                features=ch,
                kernel=4,
                stride=2,
                norm="none" if i == 0 else cfg.norm,
                groups=cfg.group_norm_groups,
                act="lrelu",
                leak=cfg.leak,
                backend=cfg.backend,
                gn_backward=cfg.gn_backward,
                wgrad=cfg.wgrad,
                # Level 0 contracts the 3-10 image/conditioning channels:
                # the conv0 engine (exact s2d rewrite) applies here only.
                conv=cfg.conv0 if i == 0 else "xla",
                axis_name=axis_name,
                spectral_norm=cfg.d_spectral_norm,
                sn_iters=cfg.sn_iters,
                name=f"conv_{i}",
            )(x)
            # "Deeper discriminator" (BASELINE.json config 3): extra stride-1
            # convs per scale.
            for j in range(cfg.d_extra_layers):
                x = ConvBlock(
                    features=ch,
                    kernel=3,
                    stride=1,
                    norm=cfg.norm,
                    groups=cfg.group_norm_groups,
                    act="lrelu",
                    leak=cfg.leak,
                    backend=cfg.backend,
                    gn_backward=cfg.gn_backward,
                    wgrad=cfg.wgrad,
                    axis_name=axis_name,
                    spectral_norm=cfg.d_spectral_norm,
                    sn_iters=cfg.sn_iters,
                    name=f"conv_{i}_extra_{j}",
                )(x)

        b = x.shape[0]
        x = x.reshape(b, -1)
        w_out = self.param(
            "logit_kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (x.shape[-1], 1),
            jnp.float32,
        )
        b_out = self.param("logit_bias", nn.initializers.zeros, (1,), jnp.float32)
        if cfg.d_spectral_norm:
            from action_conditioned_gans_tpu.models.common import spectral_normalize

            w_out = spectral_normalize(w_out, cfg.sn_iters)
        logit = ops.dense(x, w_out, b_out)  # XLA-only op (see ops.api.dense)
        return logit[:, 0].astype(jnp.float32)

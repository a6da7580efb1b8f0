"""Action-conditioned next-frame generator.

Capability parity with the reference generator (SURVEY.md §3 row 4, §4.1):
conv encoder (stride-2 stages) -> spatially-tiled action/state conditioning
concatenated at the bottleneck -> conv-transpose decoder -> tanh next frame
in [-1, 1]. Signature mirrors the reference's ``generator(image, action)``.

TPU-native choices: NHWC layout, bfloat16 compute with fp32 params,
GroupNorm default (stateless under DP), optional fused Pallas kernels.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from action_conditioned_gans_tpu.config import ModelConfig
from action_conditioned_gans_tpu.models.common import ConvBlock, channels_at, tile_condition


class Generator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        frame: jax.Array,
        action: jax.Array,
        state: Optional[jax.Array] = None,
        *,
        axis_name: Optional[str] = None,
    ) -> jax.Array:
        """frame: (B, H, W, C) in [-1, 1]; action: (B, A); state: (B, S) or None.

        Returns the predicted next frame, (B, H, W, C) in [-1, 1].
        """
        cfg = self.cfg
        if cfg.state_dim and state is None:
            raise ValueError("model config has state_dim > 0 but no state was passed")
        x = frame.astype(cfg.dtype)

        def block(**kw):
            defaults = dict(
                norm=cfg.norm,
                groups=cfg.group_norm_groups,
                leak=cfg.leak,
                backend=cfg.backend,
                gn_backward=cfg.gn_backward,
                wgrad=cfg.wgrad,
                deconv=cfg.deconv,
                axis_name=axis_name,
            )
            defaults.update(kw)
            return ConvBlock(**defaults)

        # --- Encoder: image_size -> bottleneck_size, channels double per
        # stage (capped). First stage is norm-free (DCGAN convention).
        skips = []
        for i in range(cfg.g_levels):
            x = block(
                features=channels_at(i, cfg.g_base_channels, cfg.g_max_channels),
                kernel=4,
                stride=2,
                norm="none" if i == 0 else cfg.norm,
                act="lrelu",
                # Level 0 contracts the 3-channel image: the conv0 engine
                # (exact s2d rewrite) applies to this class only.
                conv=cfg.conv0 if i == 0 else "xla",
                name=f"enc_{i}",
            )(x)
            skips.append(x)

        # --- Bottleneck: tile the conditioning vector across the spatial
        # grid and concatenate (the reference's signature op, SURVEY.md §4.1),
        # then mix with a stride-1 conv.
        s = cfg.bottleneck_size
        cond = tile_condition(action, state, s, s, dtype=cfg.dtype)
        x = jnp.concatenate([x, cond], axis=-1)
        bott_ch = channels_at(cfg.g_levels - 1, cfg.g_base_channels, cfg.g_max_channels)
        x = block(features=bott_ch, kernel=3, stride=1, act="relu", name="bottleneck")(x)

        # --- Decoder: conv-transpose stages back to image_size; final stage
        # projects to image channels with tanh and no norm.
        for i in reversed(range(cfg.g_levels)):
            if cfg.skip_connections:
                x = jnp.concatenate([x, skips[i]], axis=-1)
            last = i == 0
            x = block(
                features=cfg.image_channels
                if last
                else channels_at(i - 1, cfg.g_base_channels, cfg.g_max_channels),
                kernel=4,
                stride=2,
                transpose=True,
                norm="none" if last else cfg.norm,
                act="tanh" if last else "relu",
                name=f"dec_{i}",
            )(x)
        return x

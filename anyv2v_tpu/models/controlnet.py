"""ControlNet (SDXL canny variant) — the conditioning half of InstantStyle
(reference ``black_box_image_edit/instantstyle.py:16-23``, diffusers
``ControlNetModel`` "diffusers/controlnet-canny-sdxl-1.0").

Structure (diffusers semantics): a copy of the UNet's down + mid path, a
conditioning embedding (conv pyramid on the control image, zero-init output),
and zero-init 1x1 "controlnet blocks" producing one residual per UNet skip
plus a mid residual. Outputs are scaled by ``conditioning_scale``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Downsample2D,
    ResnetBlock2D,
    SpatialTransformer,
    TimestepEmbedding,
    sinusoidal_embedding,
)
from .unet_sd import SDUNetConfig


class ControlNetConditioningEmbedding(nn.Module):
    """diffusers ``ControlNetConditioningEmbedding``: conv_in -> interleaved
    (3x3, 3x3 stride-2) pairs over (16, 32, 96, 256) -> zero-init conv_out."""

    out_channels: int
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jax.Array) -> jax.Array:
        ch = self.block_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(ch) - 1):
            x = nn.Conv(ch[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(ch[i + 1], (3, 3), strides=2, padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="conv_out")(x)


class ControlNet(nn.Module):
    """Returns (down_residuals tuple — one per UNet skip — , mid_residual)."""

    config: SDUNetConfig = SDUNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                  # [B, h, w, 4] noisy latent
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        controlnet_cond: jax.Array,         # [B, H, W, 3] control image in [0,1]
        conditioning_scale: float = 1.0,
        added_text_embeds: Optional[jax.Array] = None,
        added_time_ids: Optional[jax.Array] = None,
    ):
        cfg = self.config
        dt = cfg.dtype
        B = sample.shape[0]
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4
        n_blocks = len(cfg.block_out_channels)

        ts = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = sinusoidal_embedding(ts, ch0).astype(dt)
        emb = TimestepEmbedding(time_embed_dim, dtype=dt, name="time_embedding")(t_emb)
        if cfg.addition_embed == "sdxl":
            ids = added_time_ids.reshape(-1)
            id_emb = sinusoidal_embedding(ids, cfg.addition_time_embed_dim)
            id_emb = id_emb.reshape(B, -1)
            aug = jnp.concatenate(
                [added_text_embeds.astype(jnp.float32), id_emb], axis=-1
            ).astype(dt)
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=dt,
                                          name="add_embedding")(aug)

        context = encoder_hidden_states.astype(dt)

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(sample.astype(dt))
        x = x + ControlNetConditioningEmbedding(
            ch0, dtype=dt, name="controlnet_cond_embedding"
        )(controlnet_cond.astype(dt))

        def zero_conv(h, idx):
            return nn.Conv(h.shape[-1], (1, 1), dtype=dt,
                           kernel_init=nn.initializers.zeros,
                           name=f"controlnet_down_blocks_{idx}")(h)

        residuals = [zero_conv(x, 0)]
        k = 1
        for i, ch in enumerate(cfg.block_out_channels):
            is_cross = cfg.cross_attn_blocks[i]
            heads = cfg.heads_for(i)
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  name=f"down_{i}_resnet_{j}")(x, emb)
                if is_cross:
                    x = SpatialTransformer(
                        heads, ch // heads, depth=cfg.depth_for(i),
                        cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=dt,
                        name=f"down_{i}_attn_{j}",
                    )(x, context=context)
                residuals.append(zero_conv(x, k)); k += 1
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=dt, name=f"down_{i}_downsample")(x)
                residuals.append(zero_conv(x, k)); k += 1

        ch = cfg.block_out_channels[-1]
        heads = cfg.heads_for(n_blocks - 1)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_0")(x, emb)
        x = SpatialTransformer(
            heads, ch // heads, depth=cfg.depth_for(n_blocks - 1),
            cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups, dtype=dt, name="mid_attn",
        )(x, context=context)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_1")(x, emb)
        mid = nn.Conv(ch, (1, 1), dtype=dt, kernel_init=nn.initializers.zeros,
                      name="controlnet_mid_block")(x)

        down = tuple(r * conditioning_scale for r in residuals)
        return down, mid * conditioning_scale

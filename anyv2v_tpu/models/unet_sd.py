"""2D Stable-Diffusion-family conditional UNet (first-frame editing stage).

Covers the image-editing backbones of the reference's stage one
(SURVEY.md §2.4):

- **SD1.5 InstructPix2Pix / MagicBrush**: in_channels=8 (noisy latent ⊕
  conditioning image latent), cross_attention_dim=768, blocks
  (320,640,1280,1280), 8 heads (HF config attention_head_dim=8 — the head
  COUNT, diffusers issue #2011), transformer depth 1
  (``black_box_image_edit/instructpix2pix.py``).
- **SDXL CosXL edit**: in_channels=8, cross_attention_dim=2048, blocks
  (320,640,1280) with down types [plain, cross(depth 2), cross(depth 10)],
  heads (5,10,20), SDXL addition embeddings (pooled text 1280 ⊕ six
  sinusoidal time_ids of dim 256 -> TimestepEmbedding into the time embed)
  (``black_box_image_edit/cosxl_edit.py``, ``cosxl/custom_pipeline.py:117``).

Reuses the shared channels-last blocks from ``layers.py``; frames never enter
here (pure 2D batch).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Downsample2D,
    ResnetBlock2D,
    SpatialTransformer,
    TimestepEmbedding,
    Upsample2D,
    sinusoidal_embedding,
)


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # HF semantics: the head COUNT, int or per-block tuple (SD1.5: 8;
    # SDXL: (5, 10, 20)).
    num_attention_heads: Union[int, Tuple[int, ...]] = 8
    # transformer blocks per attention layer, per block (SDXL: (1, 2, 10))
    transformer_depth: Union[int, Tuple[int, ...]] = 1
    # which down blocks are cross-attention blocks, in down order
    # (SD1.5: cross,cross,cross,plain; SDXL: plain,cross,cross)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    norm_num_groups: int = 32
    # "none" (SD1.5) | "sdxl" (pooled text embed + 6 sinusoidal time ids)
    addition_embed: str = "none"
    addition_time_embed_dim: int = 256
    # pooled(1280) + 6*256 = 2816 for SDXL
    projection_class_embeddings_input_dim: int = 2816
    # IP-Adapter target transformers by flax block name (InstantStyle uses
    # up_blocks.0.attentions.1 only -> "up_0_attn_1"; reference
    # instantstyle.py:27-32); non-targets never see image tokens (the
    # reference's skip processors)
    ip_adapter_targets: Tuple[str, ...] = ()
    dtype: jnp.dtype = jnp.bfloat16

    def heads_for(self, block_idx: int) -> int:
        h = self.num_attention_heads
        return h[block_idx] if isinstance(h, tuple) else h

    def depth_for(self, block_idx: int) -> int:
        d = self.transformer_depth
        return d[block_idx] if isinstance(d, tuple) else d


class SDUNet(nn.Module):
    """Input [B, H, W, in_channels] channels-last; output eps/v [B, H, W, 4]."""

    config: SDUNetConfig = SDUNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                  # [B, h, w, Cin]
        timestep: jax.Array,                # scalar or [B]; float ok (EDM)
        encoder_hidden_states: jax.Array,   # [B, S, D]
        added_text_embeds: Optional[jax.Array] = None,  # [B, 1280] (SDXL pooled)
        added_time_ids: Optional[jax.Array] = None,     # [B, 6] (SDXL)
        ip_tokens: Optional[jax.Array] = None,          # [B, N_ip, D] IP-Adapter
        ip_scale: float = 1.0,
        down_block_residuals: Optional[tuple] = None,   # ControlNet residuals
        mid_block_residual: Optional[jax.Array] = None,
    ) -> jax.Array:
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
            # diffusers SDXL get_aug_embed: sinusoidal(time_ids) flattened,
            # concat with pooled text embeds, through add_embedding
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

        skips = [x]
        for i, ch in enumerate(cfg.block_out_channels):
            is_cross = cfg.cross_attn_blocks[i]
            heads = cfg.heads_for(i)
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  name=f"down_{i}_resnet_{j}")(x, emb)
                if is_cross:
                    name = f"down_{i}_attn_{j}"
                    x = SpatialTransformer(
                        heads, ch // heads, depth=cfg.depth_for(i),
                        cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=dt,
                        ip=name in cfg.ip_adapter_targets, name=name,
                    )(x, context=context, ip_tokens=ip_tokens, ip_scale=ip_scale)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=dt, name=f"down_{i}_downsample")(x)
                skips.append(x)

        if down_block_residuals is not None:
            # ControlNet: residuals added to the SKIP samples only (the main
            # activation entering mid is untouched) — diffusers
            # UNet2DConditionModel is_controlnet semantics
            assert len(down_block_residuals) == len(skips)
            skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_block_residuals)]

        ch = cfg.block_out_channels[-1]
        heads = cfg.heads_for(n_blocks - 1)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_0")(x, emb)
        x = SpatialTransformer(
            heads, ch // heads, depth=cfg.depth_for(n_blocks - 1),
            cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups, dtype=dt,
            ip="mid_attn" in cfg.ip_adapter_targets, name="mid_attn",
        )(x, context=context, ip_tokens=ip_tokens, ip_scale=ip_scale)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_1")(x, emb)
        if mid_block_residual is not None:
            x = x + mid_block_residual.astype(x.dtype)

        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_cross = tuple(reversed(cfg.cross_attn_blocks))
        for i, ch in enumerate(rev_ch):
            is_cross = rev_cross[i]
            bidx = n_blocks - 1 - i
            heads = cfg.heads_for(bidx)
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  name=f"up_{i}_resnet_{j}")(x, emb)
                if is_cross:
                    name = f"up_{i}_attn_{j}"
                    x = SpatialTransformer(
                        heads, ch // heads, depth=cfg.depth_for(bidx),
                        cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=dt,
                        ip=name in cfg.ip_adapter_targets, name=name,
                    )(x, context=context, ip_tokens=ip_tokens, ip_scale=ip_scale)
            if i < n_blocks - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(dt)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)


# Production configs (HF checkpoints the reference loads, SURVEY.md §2.8)
SD15_IP2P = SDUNetConfig()  # timbrooks/instruct-pix2pix & vinesmsuic/magicbrush-jul7
SDXL_COSXL = SDUNetConfig(
    block_out_channels=(320, 640, 1280),
    cross_attention_dim=2048,
    num_attention_heads=(5, 10, 20),
    transformer_depth=(1, 2, 10),
    cross_attn_blocks=(False, True, True),
    addition_embed="sdxl",
)

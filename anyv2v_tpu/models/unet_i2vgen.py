"""I2VGenXL-style image-to-video UNet, TPU-first.

The reference's primary backbone is diffusers' ``I2VGenXLUNet`` (not in the
reference repo; its conditioning contract is observed at the call site
``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:845-854``):

    unet(latents, t, encoder_hidden_states=text, fps=fps,
         image_latents=..., image_embeddings=...)

- ``image_latents``: VAE latent of the conditioning frame at frame 0 plus
  (F-1) position-mask frames scaled (i+1)/(F-1)
  (``pipeline_i2vgen_xl.py:548-554``) — same shape as ``sample``; concatenated
  channelwise into an 8-channel conv_in after a per-frame projection +
  tiny temporal encoder.
- ``image_embeddings``: CLIP-vision embedding of the 224x224 center crop
  (``:788-792``), expanded into extra cross-attention context tokens.
- 3D UNet: block_out_channels (320, 640, 1280, 1280); every cross-attn block
  interleaves ResnetBlock2D -> TemporalConvLayer -> spatial Transformer ->
  temporal Transformer (SURVEY.md §2.1).

Layout: channels-last video [B, F, H, W, C]; spatial compute folds frames
into batch (static reshape under jit).

PnP injection (``sample_with_pnp``) is a traced-flag operand; injection
points replicate the reference hooks exactly (``i2vgen-xl/pnp_utils.py``):
spatial/temporal attn1 Q/K on "decoder blocks 4-11" = up_blocks[1].attn[1,2],
up_blocks[2..3].attn[0,1,2]; conv features after conv2 of
up_blocks[1].resnets[1].

Head split: the checkpoint-true i2vgen-xl split is heads=64 with
head_dim = C/64 in {5, 10, 20} (diffusers issue #2011 — the HF config's
``attention_head_dim`` is the HEAD COUNT for this UNet). The zoo default and
the converter (``utils/model_zoo.py::resolve_i2vgen_heads``) pin this split;
projection weights store each head padded to ``padded_head_dim`` (8/16/32)
so activations are born lane-aligned (``ops/attention.py``). A parity knob
that cannot be confirmed without the HF checkpoint in this offline
environment: ``num_image_context_tokens`` (image_embeddings context token
count; shapes verified at weight-conversion time).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Attention,
    Downsample2D,
    FeedForward,
    ResnetBlock2D,
    SpatialTransformer,
    TemporalConvLayer,
    TemporalTransformer,
    TimestepEmbedding,
    Upsample2D,
    adaptive_avg_pool_2d,
    fold_frames,
    sinusoidal_embedding,
    unfold_frames,
)


@dataclasses.dataclass(frozen=True)
class PnPFlags:
    """Traced per-step injection flags (one compiled graph for all steps)."""

    conv: jax.Array       # bool scalar
    spatial: jax.Array    # bool scalar
    temporal: jax.Array   # bool scalar

    @staticmethod
    def off() -> "PnPFlags":
        f = jnp.bool_(False)
        return PnPFlags(conv=f, spatial=f, temporal=f)


jax.tree_util.register_dataclass(PnPFlags)


@dataclasses.dataclass(frozen=True)
class I2VGenUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    # HF-config head semantics (diffusers issue #2011): when set, this is the
    # HEAD COUNT for block transformers (head_dim = C // heads), matching
    # `num_attention_heads = num_attention_heads or attention_head_dim` in
    # diffusers' 3D UNets. None -> heads = C // attention_head_dim (the
    # TPU-friendly 64-dim split). The weight converter resolves this from the
    # checkpoint's config.json, so converted checkpoints always match torch.
    num_attention_heads: Optional[int] = None
    norm_num_groups: int = 32
    num_image_context_tokens: int = 16
    # PnP targets, reference res_dict {1:[1,2], 2:[0,1,2], 3:[0,1,2]}
    # (pnp_utils.py:235-243) and conv at up_blocks[1].resnets[1] (:130-132).
    pnp_attn_targets: Tuple[Tuple[int, int], ...] = (
        (1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (3, 0), (3, 1), (3, 2),
    )
    pnp_conv_target: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16


class _TemporalEncoder(nn.Module):
    """Tiny transformer over frames for the projected image latents
    (diffusers ``I2VGenXLTransformerTemporalEncoder``)."""

    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(heads=2, head_dim=self.dim, out_dim=self.dim, dtype=self.dtype, name="attn1")(h)
        x = x + FeedForward(mult=4, activation="gelu", dtype=self.dtype, name="ff")(x)
        return x


class I2VGenUNet(nn.Module):
    config: I2VGenUNetConfig = I2VGenUNetConfig()

    def _heads(self, channels: int) -> Tuple[int, int]:
        if self.config.num_attention_heads:
            h = self.config.num_attention_heads
            return h, channels // h
        hd = self.config.attention_head_dim
        return channels // hd, hd

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,             # [B, F, h, w, 4]
        timestep: jax.Array,           # scalar or [B] int
        encoder_hidden_states: jax.Array,  # [B, S_text, 1024]
        fps: jax.Array,                # scalar or [B] int
        image_latents: jax.Array,      # [B, F, h, w, 4] (latent frame + masks)
        image_embeddings: jax.Array,   # [B, 1, 1024] CLIP-vision embedding
        pnp: Optional[PnPFlags] = None,
    ) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        B, F, H, W, C = sample.shape
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4
        # pnp=None (vanilla sampling / inversion, any batch size) disables the
        # injection machinery entirely; PnPFlags requires the CFG batch layout
        # [src, uncond, cond] (batch divisible by pnp_chunks).
        pnp_on = pnp is not None

        # --- 1-3. time + fps embedding, repeated per frame -----------------
        ts = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = sinusoidal_embedding(ts, ch0).astype(dt)
        t_emb = TimestepEmbedding(time_embed_dim, dtype=dt, name="time_embedding")(t_emb)
        fps_v = jnp.broadcast_to(jnp.atleast_1d(fps), (B,))
        fps_emb = sinusoidal_embedding(fps_v, ch0).astype(dt)
        fps_emb = TimestepEmbedding(time_embed_dim, dtype=dt, name="fps_embedding")(fps_emb)
        emb = jnp.repeat(t_emb + fps_emb, F, axis=0)  # [(B F), D] batch-major

        # --- 4. cross-attention context -------------------------------------
        # text tokens
        context = encoder_hidden_states.astype(dt)
        # local image context: conv-pyramid on the conditioning-frame latent
        # [B, h, w, 4] — written as a size-1-axis reduce, not a squeeze:
        # under frame sharding, GSPMD mangles slice+reshape over the sharded
        # axis (verifier RET_CHECK "ElementsIn(reshape) == ElementsIn(operand)"
        # after spmd-partitioning); a reduce partitions cleanly and is
        # mathematically identical over one element.
        img_lat0 = image_latents[:, 0:1].sum(axis=1).astype(dt)
        z = nn.Conv(C * 8, (3, 3), padding=1, dtype=dt, name="img_ctx_conv1")(img_lat0)
        z = nn.silu(z)
        z = adaptive_avg_pool_2d(z, (32, 32))
        z = nn.Conv(C * 16, (3, 3), strides=2, padding=1, dtype=dt, name="img_ctx_conv2")(z)
        z = nn.silu(z)
        z = nn.Conv(cfg.cross_attention_dim, (3, 3), strides=2, padding=1, dtype=dt, name="img_ctx_conv3")(z)
        img_ctx = z.reshape(B, 8 * 8, cfg.cross_attention_dim)  # 64 tokens
        # global image context: MLP on the CLIP embedding -> N extra tokens
        g = nn.Dense(time_embed_dim * 4, dtype=dt, name="context_embedding_1")(
            image_embeddings.astype(dt)
        )
        g = nn.silu(g)
        g = nn.Dense(
            cfg.cross_attention_dim * cfg.num_image_context_tokens, dtype=dt,
            name="context_embedding_2",
        )(g)
        g = g.reshape(B, cfg.num_image_context_tokens, cfg.cross_attention_dim)
        context = jnp.concatenate([context, img_ctx, g], axis=1)
        context = jnp.repeat(context, F, axis=0)  # [(B F), S_ctx, 1024]

        # --- image latent local path: per-frame proj + temporal encoder ----
        # F_il: inside the manual-SPMD region (parallel.mesh.manual_axis)
        # image_latents arrives REPLICATED with ALL frames (its temporal
        # encoder attends across every frame and the whole path is
        # step-invariant, so each chip computes it identically and XLA
        # hoists it out of the denoising scan) while ``sample`` holds only
        # this chip's F frames — the output is sliced to the local window
        # below. Single-device: F_il == F and the slice is a no-op.
        F_il = image_latents.shape[1]
        il = fold_frames(image_latents.astype(dt))  # [(B F_il), h, w, 4]
        il = nn.Conv(C * 4, (3, 3), padding=1, dtype=dt, name="img_lat_proj1")(il)
        il = nn.silu(il)
        il = nn.Conv(C * 4, (3, 3), padding=1, dtype=dt, name="img_lat_proj2")(il)
        il = nn.silu(il)
        il = nn.Conv(C, (3, 3), padding=1, dtype=dt, name="img_lat_proj3")(il)
        # temporal encoding over frames per pixel
        il = unfold_frames(il, F_il)  # [B, F_il, h, w, C]
        il_t = il.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F_il, C)
        il_t = _TemporalEncoder(dim=C, dtype=dt, name="image_latents_temporal_encoder")(il_t)
        il = il_t.reshape(B, H, W, F_il, C).transpose(0, 3, 1, 2, 4)
        if F_il != F:
            from ..parallel.mesh import axis_index, current_manual_axis

            ctx = current_manual_axis()
            assert ctx is not None and F_il == F * ctx[1], (
                "image_latents frame count must equal sample's (or the full "
                "count inside a manual-SPMD region)")
            idx = axis_index(ctx[0])
            il = jax.lax.dynamic_slice_in_dim(il, idx * F, F, axis=1)

        # --- 5. pre-process --------------------------------------------------
        x = jnp.concatenate([sample.astype(dt), il], axis=-1)  # [B, F, h, w, 8]
        x = fold_frames(x)
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        # diffusers: TransformerTemporalModel(num_attention_heads=8,
        # attention_head_dim=<config num_attention_heads>) — 8 heads whose
        # dim equals the HF head-count value (512 inner at production size)
        x = TemporalTransformer(
            heads=8, head_dim=cfg.num_attention_heads or cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups, dtype=dt, name="transformer_in",
        )(unfold_frames(x, F))
        x = fold_frames(x)

        # --- 6a. down blocks -------------------------------------------------
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            is_cross = i < n_blocks - 1
            heads, head_dim = self._heads(ch)
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  name=f"down_{i}_resnet_{j}")(x, emb)
                x = fold_frames(
                    TemporalConvLayer(ch, groups=cfg.norm_num_groups, dtype=dt,
                                      name=f"down_{i}_tempconv_{j}")(unfold_frames(x, F))
                )
                if is_cross:
                    x = SpatialTransformer(
                        heads, head_dim, cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=dt, name=f"down_{i}_attn_{j}",
                    )(x, context=context)
                    x = fold_frames(
                        TemporalTransformer(
                            heads, head_dim, cross_attention_dim=cfg.cross_attention_dim,
                            groups=cfg.norm_num_groups, dtype=dt, name=f"down_{i}_tempattn_{j}",
                        )(unfold_frames(x, F))
                    )
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=dt, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # --- 6b. mid block ---------------------------------------------------
        ch = cfg.block_out_channels[-1]
        heads, head_dim = self._heads(ch)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt, name="mid_resnet_0")(x, emb)
        x = fold_frames(TemporalConvLayer(ch, groups=cfg.norm_num_groups, dtype=dt,
                                          name="mid_tempconv_0")(unfold_frames(x, F)))
        x = SpatialTransformer(
            heads, head_dim, cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups, dtype=dt, name="mid_attn",
        )(x, context=context)
        x = fold_frames(
            TemporalTransformer(
                heads, head_dim, cross_attention_dim=cfg.cross_attention_dim,
                groups=cfg.norm_num_groups, dtype=dt, name="mid_tempattn",
            )(unfold_frames(x, F))
        )
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt, name="mid_resnet_1")(x, emb)
        x = fold_frames(TemporalConvLayer(ch, groups=cfg.norm_num_groups, dtype=dt,
                                          name="mid_tempconv_1")(unfold_frames(x, F)))

        # --- 6c. up blocks ---------------------------------------------------
        rev = tuple(reversed(cfg.block_out_channels))  # (1280, 1280, 640, 320)
        attn_targets = set(cfg.pnp_attn_targets)
        for i, ch in enumerate(rev):
            is_cross = i > 0  # up_blocks[0] is the plain UpBlock3D
            heads, head_dim = self._heads(ch)
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                inject_conv = pnp.conv if pnp_on and (i, j) == cfg.pnp_conv_target else None
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  name=f"up_{i}_resnet_{j}")(x, emb, inject=inject_conv)
                x = fold_frames(
                    TemporalConvLayer(ch, groups=cfg.norm_num_groups, dtype=dt,
                                      name=f"up_{i}_tempconv_{j}")(unfold_frames(x, F))
                )
                if is_cross:
                    target = pnp_on and (i, j) in attn_targets
                    x = SpatialTransformer(
                        heads, head_dim, cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=dt, name=f"up_{i}_attn_{j}",
                    )(x, context=context, inject=pnp.spatial if target else None)
                    x = fold_frames(
                        TemporalTransformer(
                            heads, head_dim, cross_attention_dim=cfg.cross_attention_dim,
                            groups=cfg.norm_num_groups, dtype=dt, name=f"up_{i}_tempattn_{j}",
                        )(unfold_frames(x, F), inject=pnp.temporal if target else None)
                    )
            if i < n_blocks - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_{i}_upsample")(x)

        # --- 7. post-process -------------------------------------------------
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(dt)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)
        return unfold_frames(x, F)

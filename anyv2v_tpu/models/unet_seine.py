"""SEINE UNet: SD1.4 inflated to 3D, 9-channel masked-video conditioning.

Rebuilds the reference ``seine/models/unet.py`` (``UNet3DConditionModel``,
:98) and its attention stack (``seine/models/attention.py``):

- input = concat([x(4), mask(1), masked_video_latent(4)]) -> 9 channels
  (``from_pretrained_2d`` sets in_channels=9 when use_concat, ``:540-605``;
  concat built in the run scripts, ``run_pnp_edit.py:183-187``);
- all convs are ``InflatedConv3d`` = 2D conv applied per frame
  (``seine/models/resnet.py:13-22``) — here frames fold into batch;
- each transformer block: spatial self attn1 -> cross attn2 -> temporal
  attn_temp over [(B HW), F, C] with T5 relative-position bias
  (max_distance=32) added to scaled scores (``attention.py:813-815, 880-917``)
  -> GEGLU ff (block order at ``attention.py:568-647``);
- no temporal convs, no fps/image embeddings (unlike i2vgen-xl).

PnP injection (``seine/pnp_utils.py``) has FOUR families: conv
(up_blocks[1].resnets[1], :153-201), spatial attn1, cross attn2
(threshold 0.0 by default, :298-374), temporal attn_temp (:376-457), on the
up-block res_dict {1:[1,2], 2:[0,1,2], 3:[0,1,2]}; the reference first
installs no-op schedules on every block (:282-294) — here non-targets simply
never receive a flag. SEINE's CFG batch order is [src, cond, uncond]
(``run_pnp_edit.py:183-187``) — the source-row overwrite is order-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention, temporal_attention
from ..ops.pnp import inject_source_rows
from ..ops.relpos import relative_position_bias
from .layers import (
    Downsample2D,
    FeedForward,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    fold_frames,
    sinusoidal_embedding,
    unfold_frames,
)


@dataclasses.dataclass(frozen=True)
class SeinePnPFlags:
    """SEINE adds a cross-attention injection family
    (``seine/pnp_utils.py:298``)."""

    conv: jax.Array
    spatial: jax.Array
    cross: jax.Array
    temporal: jax.Array


jax.tree_util.register_dataclass(SeinePnPFlags)


@dataclasses.dataclass(frozen=True)
class SeineUNetConfig:
    in_channels: int = 9
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_attention_heads: int = 8       # SD1.x: 8 heads, head_dim = C // 8
    norm_num_groups: int = 32
    relpos_num_buckets: int = 32
    relpos_max_distance: int = 32
    # the reference UNet builds one shared RotaryEmbedding(32) and every
    # temporal attention rotates the first 32 dims of each HEAD of q and k
    # (seine/models/unet.py:185, attention.py:889-891); clamped to head_dim
    # for tiny test configs
    temporal_rotary_dim: int = 32
    pnp_chunks: int = 3
    pnp_attn_targets: Tuple[Tuple[int, int], ...] = (
        (1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (3, 0), (3, 1), (3, 2),
    )
    pnp_conv_target: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16


class _SeineTransformerBlock(nn.Module):
    heads: int
    head_dim: int
    cross_attention_dim: int
    num_frames_hint: int
    relpos_num_buckets: int
    relpos_max_distance: int
    dtype: jnp.dtype
    pnp_chunks: int
    temporal_rotary_dim: int = 32

    @nn.compact
    def __call__(self, x, context, inj_spatial=None, inj_cross=None, inj_temporal=None):
        # x: [(B F), HW, C] batch-major; context: [(B F), S, D]
        inner = self.heads * self.head_dim
        bf, hw, c = x.shape
        f = self.num_frames_hint
        b = bf // f

        # --- attn1: spatial self ------------------------------------------
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn1_to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn1_to_k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn1_to_v")(h)
        if inj_spatial is not None:
            q = inject_source_rows(q, inj_spatial, self.pnp_chunks)
            k = inject_source_rows(k, inj_spatial, self.pnp_chunks)
        out = multi_head_attention(q, k, v, heads=self.heads)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn1_to_out")(out)

        # --- attn2: cross (SEINE-only injection point) --------------------
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_v")(context)
        if inj_cross is not None:
            q = inject_source_rows(q, inj_cross, self.pnp_chunks)
            k = inject_source_rows(k, inj_cross, self.pnp_chunks)
        out = multi_head_attention(q, k, v, heads=self.heads)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn2_to_out")(out)

        # --- attn_temp: frames as tokens per pixel + T5 rel-pos bias -------
        # Inside a manual-SPMD region (frames sharded over a mesh axis —
        # parallel/mesh.py) this is the block's only frame-coupled op: ONE
        # all_to_all frames->pixels hoists here (everything below is
        # pixel-local once all frames are held), reversed after temp_to_out.
        # Deep levels whose pixel count doesn't divide the mesh all-gather
        # the (tiny) frame axis and keep the local frame slice instead.
        from ..parallel.mesh import (axis_index, current_manual_axis,
                                     frames_to_pixels, gather_frames,
                                     pixels_to_frames)

        ctx_manual = current_manual_axis()
        sharded = ctx_manual is not None and ctx_manual[1] > 1
        hoisted = (sharded and hw % ctx_manual[1] == 0
                   and hw // ctx_manual[1] >= 8)
        gathered = sharded and not hoisted
        x4 = x.reshape(b, f, hw, c)
        f_att, hw_att = f, hw
        if hoisted:
            name, n = ctx_manual
            x4 = frames_to_pixels(x4, name, 1, 2)   # [b, F_glob, hw/n, c]
            f_att, hw_att = f * n, hw // n
        elif gathered:
            name, n = ctx_manual
            x4 = gather_frames(x4, name, 1)         # [b, F_glob, hw, c]
            f_att = f * n
        # module-NATIVE layout from here: [B, F_att, HW_att, C] — no
        # [(B HW), F, C] transposes; the strided kernel attends the frame
        # axis in place and the T5 bias folds into its precomputed mask
        # (ops/pallas_short_attention.short_attention_frames)
        h4 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_temp")(x4).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="temp_to_q")(h4)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="temp_to_k")(h4)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="temp_to_v")(h4)
        if inj_temporal is not None:
            # chunks split the CFG batch axis; the reference hook injects
            # the flattened q/k BEFORE the head split / rotation
            # (seine/pnp_utils.py:411-421)
            q = inject_source_rows(q, inj_temporal, self.pnp_chunks)
            k = inject_source_rows(k, inj_temporal, self.pnp_chunks)
        # per-head rotary on the first min(32, head_dim) dims of q and k
        # (shared RotaryEmbedding(32), seine/models/unet.py:185; applied in
        # _attention at attention.py:889-891)
        rot_dim = min(self.temporal_rotary_dim, self.head_dim)
        if rot_dim >= 2:
            from ..ops.rotary import (apply_rotary_partial,
                                      rotary_angles, rotary_freqs)

            # positions index the frame axis (axis 1 of [B, F, HW, H, D])
            ang = rotary_angles(jnp.arange(f_att, dtype=jnp.float32),
                                jnp.asarray(rotary_freqs(rot_dim))
                                )[:, None, None, :]

            def _rot(z):
                zh = z.reshape(b, f_att, hw_att, self.heads, self.head_dim)
                zh = apply_rotary_partial(zh, ang, rot_dim)
                return zh.reshape(b, f_att, hw_att, inner)

            q, k = _rot(q), _rot(k)
        bias_table = self.param(
            "time_rel_pos_bias",
            nn.initializers.normal(0.02),
            (self.relpos_num_buckets, self.heads),
        )
        bias = relative_position_bias(
            bias_table, f_att, f_att, num_buckets=self.relpos_num_buckets,
            max_distance=self.relpos_max_distance,
        )  # [heads, F_att, F_att]
        out = temporal_attention(q, k, v, heads=self.heads, bias=bias,
                                 pixel_sharded=sharded)
        out4 = nn.Dense(c, dtype=self.dtype, name="temp_to_out")(out)
        if hoisted:
            out4 = pixels_to_frames(out4, name, 1, 2)  # [b, f, hw, c]
        elif gathered:
            i = axis_index(name)
            out4 = jax.lax.dynamic_slice_in_dim(out4, i * f, f, axis=1)
        x = x + out4.reshape(bf, hw, c)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SeineTransformer3D(nn.Module):
    """Transformer3DModel: groupnorm -> 1x1-conv proj_in -> block -> proj_out."""

    heads: int
    head_dim: int
    cross_attention_dim: int
    num_frames_hint: int
    relpos_num_buckets: int
    relpos_max_distance: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 3
    temporal_rotary_dim: int = 32

    @nn.compact
    def __call__(self, x, context, inj_spatial=None, inj_cross=None, inj_temporal=None):
        bf, h_, w_, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h.astype(self.dtype))
        h = h.reshape(bf, h_ * w_, inner)
        ctx = jnp.repeat(context.astype(self.dtype), self.num_frames_hint, axis=0)
        h = _SeineTransformerBlock(
            self.heads, self.head_dim, self.cross_attention_dim,
            self.num_frames_hint, self.relpos_num_buckets, self.relpos_max_distance,
            self.dtype, self.pnp_chunks,
            temporal_rotary_dim=self.temporal_rotary_dim, name="block",
        )(h, ctx, inj_spatial, inj_cross, inj_temporal)
        h = h.reshape(bf, h_, w_, inner)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class SeineUNet(nn.Module):
    """Input [B, F, h, w, 9] (latent + mask + masked-video latent),
    output eps [B, F, h, w, 4]."""

    config: SeineUNetConfig = SeineUNetConfig()

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                 # [B, F, h, w, 9]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,  # [B, S, 768]
        pnp: Optional[SeinePnPFlags] = None,
    ) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        pnp_on = pnp is not None
        B, F, H, W, C = sample.shape
        ch0 = cfg.block_out_channels[0]
        heads = cfg.num_attention_heads

        ts = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = sinusoidal_embedding(ts, ch0).astype(dt)
        emb = TimestepEmbedding(ch0 * 4, dtype=dt, name="time_embedding")(t_emb)
        emb = jnp.repeat(emb, F, axis=0)

        context = encoder_hidden_states.astype(dt)

        def transformer(name, ch):
            return SeineTransformer3D(
                heads, ch // heads, cfg.cross_attention_dim, F,
                cfg.relpos_num_buckets, cfg.relpos_max_distance,
                groups=cfg.norm_num_groups, dtype=dt, pnp_chunks=cfg.pnp_chunks,
                temporal_rotary_dim=cfg.temporal_rotary_dim, name=name,
            )

        x = fold_frames(sample.astype(dt))
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(x)

        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            is_cross = i < n_blocks - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  pnp_chunks=cfg.pnp_chunks,
                                  name=f"down_{i}_resnet_{j}")(x, emb)
                if is_cross:
                    x = transformer(f"down_{i}_attn_{j}", ch)(x, context)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=dt, name=f"down_{i}_downsample")(x)
                skips.append(x)

        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_0")(x, emb)
        x = transformer("mid_attn", ch)(x, context)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_1")(x, emb)

        rev = tuple(reversed(cfg.block_out_channels))
        attn_targets = set(cfg.pnp_attn_targets)
        for i, ch in enumerate(rev):
            is_cross = i > 0
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                inj_conv = (pnp.conv if pnp_on and (i, j) == cfg.pnp_conv_target
                            else None)
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  pnp_chunks=cfg.pnp_chunks,
                                  name=f"up_{i}_resnet_{j}")(x, emb, inject=inj_conv)
                if is_cross:
                    target = pnp_on and (i, j) in attn_targets
                    x = transformer(f"up_{i}_attn_{j}", ch)(
                        x, context,
                        inj_spatial=pnp.spatial if target else None,
                        inj_cross=pnp.cross if target else None,
                        inj_temporal=pnp.temporal if target else None,
                    )
            if i < n_blocks - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(dt)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)
        return unfold_frames(x, F)

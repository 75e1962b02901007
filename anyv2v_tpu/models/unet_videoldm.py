"""VideoLDM-style UNet (ConsistI2V backbone), TPU-first.

Rebuilds the reference's ``VideoLDMUNet3DConditionModel``
(``consisti2v/consisti2v/models/videoldm_unet.py:68``) and its block zoo:

- first-frame conditioning mode "concat": the clean first-frame latent is
  prepended on the FRAME axis (video_length += 1, ``videoldm_unet.py:712-714``)
  and frame 0 is stripped from the output (``:1022-1023``);
- per layer: ResnetBlock2D -> alpha-gated TemporalResnetBlock (two 3x1x1
  conv3d, ``videoldm_unet_blocks.py:225-313``; gate out = a*x + (1-a)*res,
  a clamped [0,1] at :307-311) -> spatial transformer whose self-attention
  K/V are concat([tokens, first-frame tokens]) when conditioning
  (``videoldm_transformer_blocks.py:479-489``) -> alpha-gated temporal
  transformer (gate at :308-312) with rotary embedding applied to the FIRST
  HALF of the flattened inner dim before head split (RotaryEmbedding(inner//2)
  convention, ``videoldm_attention.py:552-561``) or the vendored sinusoidal
  PE (``:644-663``), plus optional "augmented" keys: the 8-neighborhood of
  the first frame, center-masked, replicate-padded (``videoldm_transformer_
  blocks.py:490-504``) with zero rotary positions (``videoldm_attention.py:
  588-599``);
- mid block has spatial attention only (resnet0/conv3d0 then [attn, resnet,
  conv3d] — ``videoldm_unet_blocks.py:748``, no temporal attention);
- frame-stride conditioning: a second TimestepEmbedding added to the time
  embedding (``videoldm_unet.py:787-811``).

PnP injection points (``consisti2v/pnp_utils.py``): spatial attn1 Q/K on
up_blocks res_dict {1:[1,2],2:[0,1,2],3:[0,1,2]}, temporal attn1 Q/K on the
same ``tempo_attns`` indices (:356-363; injection happens BEFORE rotation,
matching the reference processor), conv features at up_blocks[1].resnets[1]
(:119-121). The CFG chunk count varies (2/3/4 — dual text+image guidance),
so it is a config field.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import (multi_head_attention,
                             spatial_attention_ffconcat, temporal_attention)
from ..ops.pnp import inject_source_rows
from ..ops.rotary import (apply_rotary_partial, rotary_angles,
                          rotary_freqs)
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
from .unet_i2vgen import PnPFlags


@dataclasses.dataclass(frozen=True)
class VideoLDMUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64       # spatial: heads = C // head_dim
    n_temp_heads: int = 8              # temporal: head_dim = C // n_temp_heads
    norm_num_groups: int = 32
    first_frame_condition_mode: str = "concat"   # none | concat | conv2d | input_only
    temp_pos_embedding: str = "rotary"           # rotary | sinusoidal
    augment_temporal_attention: bool = True
    use_frame_stride_condition: bool = True
    use_temporal: bool = True
    pnp_chunks: int = 4                # [src, uncond, img, both] dual CFG
    pnp_attn_targets: Tuple[Tuple[int, int], ...] = (
        (1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (3, 0), (3, 1), (3, 2),
    )
    pnp_conv_target: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16


def videoldm_positional_encoding(length: int, dim: int) -> np.ndarray:
    """Vendored ConsistI2V ``PositionalEncoding`` (``videoldm_attention.py:644``):
    freq = exp(arange(dim/2)/dim * ln 10000); pe = interleave(sin, cos)."""
    pos = np.arange(length, dtype=np.float64)
    freq = np.exp(np.arange(dim // 2, dtype=np.float64) / dim * np.log(10000.0))
    x = pos[:, None] / freq[None, :]
    pe = np.stack([np.sin(x), np.cos(x)], axis=-1).reshape(length, dim)
    return pe.astype(np.float32)


def _manual_seq_ctx():
    """(axis_name, n) inside a >1-device manual-SPMD region, else None."""
    from ..parallel.mesh import current_manual_axis

    ctx = current_manual_axis()
    if ctx is None or ctx[1] <= 1:
        return None
    return ctx


def _assemble_true_sequence(x4, f0row, name, n):
    """Build the TRUE global frame sequence from the chip-local layout.

    ConsistI2V's "concat" conditioning rides the UNet as frame 0 of an
    F+1-frame sequence; inside the manual-SPMD region (frames sharded, n
    chips) the local layout is [B, f0row + F/n, P, C] where row 0 (when
    ``f0row`` = 1) is the REPLICATED conditioning frame — a plain all_to_all
    of the whole local axis would interleave n copies of it. Returns
    (seq, pixel_mode):

    - pixel_mode=True: [B, f0row + F, P/n, C] — ONE all_to_all of the real
      frames to pixel sharding, the replicated frame's local pixel slice
      prepended (frame axis complete, pixels split);
    - pixel_mode=False (tiny deep-level grids whose pixel count doesn't
      divide the mesh): [B, f0row + F, P, C] via an all-gather of the
      (short) real frame axis."""
    from ..parallel.mesh import (frames_to_pixels, gather_frames,
                                 local_pixel_slice)

    p = x4.shape[2]
    pixel_mode = p % n == 0 and p // n >= 8
    if pixel_mode:
        seq = frames_to_pixels(x4[:, f0row:], name, 1, 2)
        if f0row:
            f0 = local_pixel_slice(x4[:, :f0row], name, n, 2)
            seq = jnp.concatenate([f0, seq], axis=1)
        return seq, True
    seq = gather_frames(x4[:, f0row:], name, 1)
    if f0row:
        seq = jnp.concatenate([x4[:, :f0row], seq], axis=1)
    return seq, False


def _disassemble_true_sequence(out, f0row, name, n, pixel_mode, f_real_loc):
    """Inverse of :func:`_assemble_true_sequence`: back to the chip-local
    [B, f0row + F/n, P, C] layout. The conditioning frame's updated row is
    re-replicated (all-gather of ONE frame's pixels in pixel mode; in gather
    mode every chip already computed the identical full-pixel row)."""
    from ..parallel.mesh import axis_index, gather_pixels, pixels_to_frames

    if pixel_mode:
        real = pixels_to_frames(out[:, f0row:], name, 1, 2)
        if f0row:
            f0 = gather_pixels(out[:, :f0row], name, 2)
            real = jnp.concatenate([f0, real], axis=1)
        return real
    i = axis_index(name)
    real = jax.lax.dynamic_slice_in_dim(out[:, f0row:], i * f_real_loc,
                                        f_real_loc, axis=1)
    if f0row:
        real = jnp.concatenate([out[:, :f0row], real], axis=1)
    return real


class AlphaTemporalResnet(nn.Module):
    """alpha-gated temporal resnet (two 3x1x1 conv3d) on [B, F, H, W, C].

    (The reference class also creates a ``time_emb_proj`` that is never fed a
    temb at runtime — omitted here; the weight converter skips it.)

    ``first_frame_replicated``: concat-mode layout flag for the manual-SPMD
    region (frame 0 = replicated conditioning frame — see
    :func:`_assemble_true_sequence`)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    first_frame_replicated: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.pallas_temporal_conv import groupnorm_silu_temporal_conv3
        from .layers import _GroupNormParams, _TemporalConv3Params

        ctx_m = _manual_seq_ctx()
        if ctx_m is None:
            h = x
        else:
            # manual-SPMD region: assemble the true frame sequence ONCE
            # around both convs (frame-coupled + the group statistics must
            # count the conditioning frame exactly once)
            name, n = ctx_m
            f0row = 1 if self.first_frame_replicated else 0
            b, f_loc = x.shape[:2]
            x4 = x.reshape(b, f_loc, -1, x.shape[-1])
            h, pixel_mode = _assemble_true_sequence(x4, f0row, name, n)
        for i in (1, 2):
            gamma, beta = _GroupNormParams(name=f"norm{i}")(h.shape[-1])
            kernel, bias = _TemporalConv3Params(
                self.channels, name=f"conv{i}")(h.shape[-1])
            h = groupnorm_silu_temporal_conv3(
                h, gamma, beta, kernel, bias, self.groups, self.eps,
                self.dtype, pixel_sharded=ctx_m is not None)
        if ctx_m is not None:
            h = _disassemble_true_sequence(h, f0row, name, n, pixel_mode,
                                           f_loc - f0row)
            h = h.reshape(x.shape[:-1] + (h.shape[-1],))
        out = x + h
        alpha = jnp.clip(self.param("alpha", nn.initializers.ones, (1,)), 0.0, 1.0)
        return (alpha * x + (1.0 - alpha) * out).astype(x.dtype)


class _SpatialFFBlock(nn.Module):
    """BasicConditionalTransformerBlock, spatial variant: self-attn with
    optional first-frame K/V concat, cross-attn, GEGLU FF."""

    heads: int
    head_dim: int
    cross_attention_dim: int
    num_frames_hint: int  # static frames count for the first-frame gather
    condition_on_first_frame: bool
    dtype: jnp.dtype
    pnp_chunks: int

    @nn.compact
    def __call__(self, x, context, inject=None):
        # x: [(B F), HW, C] batch-major frames
        inner = self.heads * self.head_dim
        bf, hw, c = x.shape
        f = self.num_frames_hint
        b = bf // f
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)

        to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn1_to_q")
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn1_to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn1_to_v")
        q = to_q(h)
        k = to_k(h)
        v = to_v(h)
        if inject is not None:          # PnP: Q/K substituted, V untouched
            q = inject_source_rows(q, inject, self.pnp_chunks)
            k = inject_source_rows(k, inject, self.pnp_chunks)
        if self.condition_on_first_frame:
            # frame-0 K/V are SHARED by all f frames: project them ONCE per
            # batch row and let the split-KV attention reuse them, instead
            # of the reference's repeat+concat (which materializes ~f x the
            # frame-0 keys, then projects and transposes every copy —
            # videoldm_transformer_blocks.py:479-504)
            ff = h.reshape(b, f, hw, c)[:, 0]                      # [B, HW, C]
            k_ctx = to_k(ff)
            v_ctx = to_v(ff)
            if inject is not None:
                k_ctx = inject_source_rows(k_ctx, inject, self.pnp_chunks)
            attn = spatial_attention_ffconcat(
                q, k, v, k_ctx, v_ctx, frames=f, heads=self.heads)
        else:
            attn = multi_head_attention(q, k, v, heads=self.heads)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn1_to_out")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_v")(context)
        attn = multi_head_attention(q, k, v, heads=self.heads)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn2_to_out")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class VideoLDMSpatialTransformer(nn.Module):
    """Transformer2DConditionModel spatial variant (no alpha gate)."""

    heads: int
    head_dim: int
    cross_attention_dim: int
    num_frames_hint: int
    condition_on_first_frame: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 4

    @nn.compact
    def __call__(self, x, context, inject=None):
        bf, h_, w_, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h.astype(self.dtype))
        h = h.reshape(bf, h_ * w_, inner)
        # context repeated per frame (batch-major)
        ctx = jnp.repeat(context.astype(self.dtype), self.num_frames_hint, axis=0)
        h = _SpatialFFBlock(
            self.heads, self.head_dim, self.cross_attention_dim,
            self.num_frames_hint, self.condition_on_first_frame,
            self.dtype, self.pnp_chunks, name="block",
        )(h, ctx, inject=inject)
        h = h.reshape(bf, h_, w_, inner)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class _TemporalAttention(nn.Module):
    """TemporalConditionalAttention: frames as tokens per pixel; rotary on the
    first half of the flattened inner dim (before head split) or vendored
    sinusoidal PE added to hidden states; optional augmented first-frame keys."""

    heads: int
    head_dim: int
    rotary: bool
    dtype: jnp.dtype
    pnp_chunks: int

    @nn.compact
    def __call__(self, x, adjacent_slices=None, inject=None,
                 pixel_sharded=False):
        # x: [B, F, HW, C] (module-NATIVE layout — no [(B HW), F, C]
        # transposes; the strided kernel attends over the frame axis in
        # place); adjacent_slices: [B, 8, HW, C] first-frame window keys
        # appended along the frame axis. pixel_sharded: inside a manual-SPMD
        # region the caller (VideoLDMTemporalTransformer) already assembled
        # the true global frame sequence — suppress the op-level reshard.
        inner = self.heads * self.head_dim
        b, f, hw, c = x.shape

        if not self.rotary:
            pe = jnp.asarray(videoldm_positional_encoding(f, inner))
            x_in = x + pe[None, :, None, :].astype(x.dtype)
        else:
            x_in = x

        if adjacent_slices is not None:
            if not self.rotary:
                pe0 = jnp.asarray(videoldm_positional_encoding(1, inner))
                adjacent_slices = adjacent_slices + pe0.reshape(
                    1, 1, 1, inner).astype(x.dtype)
            ctx = jnp.concatenate([x_in, adjacent_slices], axis=1)
        else:
            ctx = x_in                                # [B, F(+8), HW, C]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x_in)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        if inject is not None:
            # reference injects before rotation (consisti2v/pnp_utils.py:314-318)
            q = inject_source_rows(q, inject, self.pnp_chunks)
            k = inject_source_rows(k, inject, self.pnp_chunks)

        if self.rotary:
            # RotaryEmbedding(inner // 2): only the first inner//2 channels
            # rotate; freqs follow the 'lang' convention on dim inner//2.
            # Positions index the FRAME axis (axis 1): angles broadcast
            # [1, F, 1, rot_dim].
            rot_dim = inner // 2
            freqs = jnp.asarray(rotary_freqs(rot_dim))
            q_pos = jnp.arange(f, dtype=jnp.float32)
            q_ang = rotary_angles(q_pos, freqs)[None, :, None, :]
            q = apply_rotary_partial(q, q_ang, rot_dim)
            k_len = ctx.shape[1]
            if adjacent_slices is None:
                k_pos = jnp.arange(k_len, dtype=jnp.float32)
            else:
                k_pos = jnp.concatenate(
                    [jnp.arange(f, dtype=jnp.float32), jnp.zeros(k_len - f)])
            k_ang = rotary_angles(k_pos, freqs)[None, :, None, :]
            k = apply_rotary_partial(k, k_ang, rot_dim)

        out = temporal_attention(q, k, v, heads=self.heads,
                                 pixel_sharded=pixel_sharded)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


def _first_frame_adjacent_slices(first_frame_tokens: jax.Array, h: int, w: int) -> jax.Array:
    """8-neighborhood of each pixel in the first frame, replicate-padded,
    center excluded; unfold order (reference mask [[1,1,1],[1,0,1],[1,1,1]]).

    first_frame_tokens: [B, HW, C] -> [B, 8, HW, C] (native temporal layout:
    each neighbor is a pixel-shifted copy of frame 0, so it lands as a
    frame-axis row — pure slices + one stack, no per-pixel transpose)
    """
    b, hw, c = first_frame_tokens.shape
    img = first_frame_tokens.reshape(b, h, w, c)
    padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    offsets = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
    slices = [padded[:, di:di + h, dj:dj + w, :] for di, dj in offsets]
    stacked = jnp.stack(slices, axis=1)  # [B, 8, H, W, C]
    return stacked.reshape(b, 8, h * w, c)


class VideoLDMTemporalTransformer(nn.Module):
    """Temporal Transformer2DConditionModel: alpha-gated whole-output."""

    heads: int
    head_dim: int
    cross_attention_dim: int
    num_frames_hint: int
    augment: bool
    rotary: bool
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 4
    # concat-mode layout flag for the manual-SPMD region: frame 0 of the
    # local axis is the REPLICATED conditioning frame (_assemble_true_sequence)
    first_frame_replicated: bool = False

    @nn.compact
    def __call__(self, x, context, inject=None):
        # x: [(B F), H, W, C]
        bf, h_, w_, c = x.shape
        f = self.num_frames_hint
        b = bf // f
        hw = h_ * w_
        inner = self.heads * self.head_dim
        input_states = x

        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h.astype(self.dtype))
        tokens = h.reshape(bf, hw, inner)

        # --- attn1: temporal self-attention per pixel ----------------------
        # module-NATIVE layout throughout: [(B F), HW, C'] views as
        # [B, F, HW, C'] for free (b-major fold), the strided kernel attends
        # over the frame axis in place, and the first-frame window keys are
        # frame-axis rows — the [(B F),HW,C'] <-> [(B HW),F,C'] transpose
        # pairs this module used to pay (4 full-tensor copies) are gone
        # (measured ~44 ms/step of 'data formatting' on the ConsistI2V trace).
        normed = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(tokens).astype(self.dtype)
        normed4 = normed.reshape(b, f, hw, inner)       # free reshape
        ctx_m = _manual_seq_ctx()
        f0row = 1 if (ctx_m is not None and self.first_frame_replicated) else 0
        adj = None
        if self.augment:
            if ctx_m is not None and f0row == 0:
                # global frame 0 lives on one chip: gather the (1-frame)
                # slice so every chip holds the full-pixel first frame
                from ..parallel.mesh import gather_frames

                ff_tokens = gather_frames(normed4[:, :1], ctx_m[0], 1)[:, 0]
            else:
                # unsharded, or concat mode where row 0 is the replicated
                # conditioning frame
                ff_tokens = normed4[:, 0]
            adj = _first_frame_adjacent_slices(ff_tokens, h_, w_)
        attn = _TemporalAttention(
            self.heads, self.head_dim, self.rotary, self.dtype, self.pnp_chunks,
            name="attn1",
        )
        if ctx_m is None:
            attn_out4 = attn(normed4, adjacent_slices=adj, inject=inject)
        else:
            # manual-SPMD region: assemble the true global frame sequence
            # (see _assemble_true_sequence), attend with all frames local,
            # reverse — positions/PE inside see the global frame axis
            name_m, n_m = ctx_m
            seq, pixel_mode = _assemble_true_sequence(normed4, f0row,
                                                      name_m, n_m)
            if adj is not None and pixel_mode:
                from ..parallel.mesh import local_pixel_slice

                adj = local_pixel_slice(adj, name_m, n_m, 2)
            attn_seq = attn(seq, adjacent_slices=adj, inject=inject,
                            pixel_sharded=True)
            attn_out4 = _disassemble_true_sequence(
                attn_seq, f0row, name_m, n_m, pixel_mode, f - f0row)
        tokens = tokens + attn_out4.reshape(bf, hw, inner)

        # --- attn2: cross-attention to text -------------------------------
        # the text K/V are shared by every (frame, pixel) token, so this is
        # ONE cross-attention over [B, F*HW, C'] rows — equivalent to the
        # reference's per-pixel-row form (each row attends the same keys)
        # but without the HW-fold transposes or the hw-times repeated K/V.
        normed = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(tokens).astype(self.dtype)
        normed4 = normed.reshape(b, f, hw, inner)       # free reshape
        # frame positions are GLOBAL: inside the manual-SPMD region this
        # chip's rows are [f0?, f0row + i*F/n .. ] of the true sequence
        if ctx_m is None:
            f_glob = f
            pos = jnp.arange(f)
        else:
            f_real_loc = f - f0row
            f_glob = f0row + f_real_loc * ctx_m[1]
            from ..parallel.mesh import axis_index as _axis_index

            i_dev = _axis_index(ctx_m[0])
            pos = jnp.concatenate([
                jnp.arange(f0row),
                f0row + i_dev * f_real_loc + jnp.arange(f_real_loc)])
        if not self.rotary:
            # reference TemporalConditionalAttention.forward adds the
            # sinusoidal PE to hidden states for EVERY call, attn2 included
            # (videoldm_attention.py:577-580)
            pe = jnp.asarray(videoldm_positional_encoding(f_glob, inner))[pos]
            normed4 = normed4 + pe[None, :, None, :].astype(normed4.dtype)
        q4 = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="attn2_to_q")(normed4)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="attn2_to_k")(context.astype(self.dtype))
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="attn2_to_v")(context.astype(self.dtype))
        if self.rotary:
            # RotaryEmbAttnProcessor2_0 rotates the QUERY unconditionally —
            # cross-attention included (videoldm_attention.py:774); keys stay
            # unrotated (qlen != klen, no key_pos_idx).
            rot_dim = inner // 2
            freqs = jnp.asarray(rotary_freqs(rot_dim))
            q_ang = rotary_angles(pos.astype(jnp.float32),
                                  freqs)[None, :, None, :]
            q4 = apply_rotary_partial(q4, q_ang, rot_dim)
        cross = multi_head_attention(q4.reshape(b, f * hw, inner), k, v,
                                     heads=self.heads)
        cross = nn.Dense(inner, dtype=self.dtype, name="attn2_to_out")(cross)
        tokens = tokens + cross.reshape(bf, hw, inner)

        normed = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(tokens).astype(self.dtype)
        tokens = tokens + FeedForward(dtype=self.dtype, name="ff")(normed)

        out = tokens.reshape(bf, h_, w_, inner)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        out = out + input_states

        alpha = jnp.clip(self.param("alpha", nn.initializers.ones, (1,)), 0.0, 1.0)
        return (alpha * input_states + (1.0 - alpha) * out).astype(x.dtype)


class VideoLDMUNet(nn.Module):
    """Full ConsistI2V UNet. Input/output [B, F, h, w, C] channels-last;
    ``first_frame_latents`` [B, 1, h, w, C] prepended on the frame axis in
    "concat" mode and stripped from the output."""

    config: VideoLDMUNetConfig = VideoLDMUNetConfig()

    def _sp_heads(self, ch):
        return ch // self.config.attention_head_dim, self.config.attention_head_dim

    def _tp_heads(self, ch):
        return self.config.n_temp_heads, ch // self.config.n_temp_heads

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,                 # [B, F, h, w, 4]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,  # [B, S, D]
        first_frame_latents: Optional[jax.Array] = None,  # [B, 1, h, w, 4]
        frame_stride: Optional[jax.Array] = None,
        pnp: Optional[PnPFlags] = None,
    ) -> jax.Array:
        cfg = self.config
        dt = cfg.dtype
        # reference semantics (videoldm_unet.py:712-714, :1022-1023): EVERY
        # non-"none" mode prepends the first-frame latent on the frame axis
        # and strips frame 0 from the output; "concat" and "conv2d"
        # additionally condition spatial self-attention on frame-0 tokens
        # (videoldm_unet_blocks.py:506 — condition_on_first_frame excludes
        # only none/input_only); "conv2d" further REPLACES frame 0 of the
        # hidden states at each block entry with a 1x1-conv'd
        # nearest-resized first-frame latent (:508-521).
        concat_mode = cfg.first_frame_condition_mode != "none"
        cond_spatial = cfg.first_frame_condition_mode in ("concat", "conv2d")
        conv2d_mode = cfg.first_frame_condition_mode == "conv2d"
        pnp_on = pnp is not None

        if concat_mode:
            if first_frame_latents is None:
                raise ValueError("first_frame_condition_mode needs first_frame_latents")
            sample = jnp.concatenate([first_frame_latents, sample], axis=1)

        B, F, H, W, C = sample.shape
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        ts = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = sinusoidal_embedding(ts, ch0).astype(dt)
        emb = TimestepEmbedding(time_embed_dim, dtype=dt, name="time_embedding")(t_emb)
        if cfg.use_frame_stride_condition:
            fs = jnp.broadcast_to(jnp.atleast_1d(
                frame_stride if frame_stride is not None else jnp.int32(1)), (B,))
            fs_emb = sinusoidal_embedding(fs, ch0).astype(dt)
            # zero-init output proj (videoldm_unet.py:234-245): start as no-op
            fs_hidden = nn.Dense(time_embed_dim, dtype=dt, name="frame_stride_fc1")(fs_emb)
            fs_hidden = nn.silu(fs_hidden)
            fs_out = nn.Dense(time_embed_dim, dtype=dt, kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros, name="frame_stride_fc2")(fs_hidden)
            emb = emb + fs_out
        emb = jnp.repeat(emb, F, axis=0)  # [(B F), D]

        context = encoder_hidden_states.astype(dt)

        x = fold_frames(sample.astype(dt))
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(x)

        def spatial_tr(name, ch, targeted):
            heads, hd = self._sp_heads(ch)
            return VideoLDMSpatialTransformer(
                heads, hd, cfg.cross_attention_dim, F, cond_spatial,
                groups=cfg.norm_num_groups, dtype=dt, pnp_chunks=cfg.pnp_chunks,
                name=name,
            )

        def ff_conv_inject(x, name):
            """conv2d mode: replace frame 0 of the hidden states with a
            1x1-conv of the nearest-resized first-frame latent
            (videoldm_unet_blocks.py:508-521; torch-nearest indexing =
            floor(i * in/out))."""
            bf, h_, w_, c = x.shape
            ff = first_frame_latents[:, 0].astype(dt)  # [B, h0, w0, 4]
            ih, iw = ff.shape[1], ff.shape[2]
            if (ih, iw) != (h_, w_):
                idx_h = jnp.floor(jnp.arange(h_) * (ih / h_)).astype(jnp.int32)
                idx_w = jnp.floor(jnp.arange(w_) * (iw / w_)).astype(jnp.int32)
                ff = ff[:, idx_h][:, :, idx_w]
            ff = nn.Conv(c, (1, 1), dtype=dt, name=name)(ff)
            xv = x.reshape(bf // F, F, h_, w_, c)
            xv = xv.at[:, 0].set(ff.astype(xv.dtype))
            return xv.reshape(bf, h_, w_, c)

        def temporal_tr(name, ch):
            heads, hd = self._tp_heads(ch)
            return VideoLDMTemporalTransformer(
                heads, hd, cfg.cross_attention_dim, F,
                augment=cfg.augment_temporal_attention,
                rotary=cfg.temp_pos_embedding == "rotary",
                groups=cfg.norm_num_groups, dtype=dt, pnp_chunks=cfg.pnp_chunks,
                first_frame_replicated=concat_mode, name=name,
            )

        # --- down ----------------------------------------------------------
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            is_cross = i < n_blocks - 1
            if conv2d_mode:
                x = ff_conv_inject(x, f"down_{i}_first_frame_conv")
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  pnp_chunks=cfg.pnp_chunks,
                                  name=f"down_{i}_resnet_{j}")(x, emb)
                if cfg.use_temporal:
                    x = fold_frames(AlphaTemporalResnet(
                        ch, groups=cfg.norm_num_groups, dtype=dt,
                        first_frame_replicated=concat_mode,
                        name=f"down_{i}_conv3d_{j}")(unfold_frames(x, F)))
                if is_cross:
                    x = spatial_tr(f"down_{i}_attn_{j}", ch, False)(x, context)
                    if cfg.use_temporal:
                        x = temporal_tr(f"down_{i}_tempattn_{j}", ch)(x, context)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=dt, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # --- mid (spatial attention only; videoldm_unet_blocks.py:748) -----
        ch = cfg.block_out_channels[-1]
        if conv2d_mode:
            x = ff_conv_inject(x, "mid_first_frame_conv")
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_0")(x, emb)
        if cfg.use_temporal:
            x = fold_frames(AlphaTemporalResnet(
                ch, groups=cfg.norm_num_groups, dtype=dt,
                first_frame_replicated=concat_mode, name="mid_conv3d_0")(
                unfold_frames(x, F)))
        x = spatial_tr("mid_attn", ch, False)(x, context)
        x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                          name="mid_resnet_1")(x, emb)
        if cfg.use_temporal:
            x = fold_frames(AlphaTemporalResnet(
                ch, groups=cfg.norm_num_groups, dtype=dt,
                first_frame_replicated=concat_mode, name="mid_conv3d_1")(
                unfold_frames(x, F)))

        # --- up --------------------------------------------------------------
        rev = tuple(reversed(cfg.block_out_channels))
        attn_targets = set(cfg.pnp_attn_targets)
        for i, ch in enumerate(rev):
            is_cross = i > 0
            if conv2d_mode:
                x = ff_conv_inject(x, f"up_{i}_first_frame_conv")
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                inject_conv = (pnp.conv if pnp_on and (i, j) == cfg.pnp_conv_target
                               else None)
                x = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dt,
                                  pnp_chunks=cfg.pnp_chunks,
                                  name=f"up_{i}_resnet_{j}")(x, emb, inject=inject_conv)
                if cfg.use_temporal:
                    x = fold_frames(AlphaTemporalResnet(
                        ch, groups=cfg.norm_num_groups, dtype=dt,
                        first_frame_replicated=concat_mode,
                        name=f"up_{i}_conv3d_{j}")(unfold_frames(x, F)))
                if is_cross:
                    target = pnp_on and (i, j) in attn_targets
                    x = spatial_tr(f"up_{i}_attn_{j}", ch, target)(
                        x, context, inject=pnp.spatial if target else None)
                    if cfg.use_temporal:
                        x = temporal_tr(f"up_{i}_tempattn_{j}", ch)(
                            x, context, inject=pnp.temporal if target else None)
            if i < n_blocks - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(dt)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(x)
        out = unfold_frames(x, F)
        if concat_mode:
            out = out[:, 1:]  # strip the conditioning frame (videoldm_unet.py:1022)
        return out

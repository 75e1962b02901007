"""Shared UNet building blocks (flax.linen), channels-last.

These rebuild — TPU-first, inference-only — the diffusers blocks the reference
leans on (SURVEY.md §2.9): ResnetBlock2D, TemporalConvLayer,
Transformer2DModel ("spatial transformer"), TransformerTemporalModel, and the
sinusoidal/MLP timestep embeddings. Layout conventions:

- spatial tensors  [(B·F), H, W, C]   (frames folded into batch — the same
  trick the reference uses, ``videoldm_unet.py:720``, ``seine/models/resnet.py:14-22``,
  but as static reshapes under jit)
- temporal tensors [B, F, H, W, C]    (unfolded only inside temporal layers)

PnP injection is an explicit traced-bool operand (``inject``), not a hook:
see ``anyv2v_tpu.ops.pnp``. Injection points match the reference exactly —
ResnetBlock2D injects after conv2 / before the shortcut add
(``i2vgen-xl/pnp_utils.py:107-124``); attention injects Q and K, not V
(``pnp_utils.py:189-196``).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import multi_head_attention, padded_head_dim, temporal_attention
from ..ops.pnp import inject_source_rows

# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


def sinusoidal_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """diffusers ``Timesteps`` / ``get_timestep_embedding`` (fp32)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear (diffusers ``TimestepEmbedding``)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


# ---------------------------------------------------------------------------
# Resnet
# ---------------------------------------------------------------------------


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (default time_embedding_norm): the PnP conv
    injection point lives after conv2, before the shortcut add
    (``pnp_utils.py:107-124``)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 3

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: Optional[jax.Array] = None,
        inject: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            temb = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb[:, None, None, :]

        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if inject is not None:
            h = inject_source_rows(h, inject, self.pnp_chunks)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class _GroupNormParams(nn.Module):
    """Parameter shell with nn.GroupNorm's exact tree ({scale, bias})."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (features,), jnp.float32)
        return scale, bias


class _TemporalConv3Params(nn.Module):
    """Parameter shell with nn.Conv's exact (3,1,1)-kernel tree."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init,
                       (3, 1, 1, in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class TemporalConvLayer(nn.Module):
    """diffusers ``TemporalConvLayer``: four (groupnorm -> silu -> conv3d
    (3,1,1)) blocks with an identity residual; the last conv is zero-init so
    the layer starts as identity. Operates on [B, F, H, W, C].

    Each block runs as one fused groupnorm+silu+temporal-conv pass
    (:mod:`anyv2v_tpu.ops.pallas_temporal_conv`) — param tree identical to
    the nn.GroupNorm/nn.Conv modules it replaces."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.pallas_temporal_conv import groupnorm_silu_temporal_conv3

        from ..parallel.mesh import (current_manual_axis, frames_to_pixels,
                                     pixels_to_frames)

        identity = x
        # flatten H, W into one pixel axis: the op's math is pixel-pointwise,
        # and a single flat axis reshards cleanly at every UNet level
        b, f = x.shape[:2]
        c_in = x.shape[-1]
        h = x.reshape(b, f, -1, c_in)
        # manual-SPMD region: ONE all_to_all to pixel sharding covers all
        # four frame-coupled convs (vs one per conv), reversed at exit
        ctx = current_manual_axis()
        n_pix = h.shape[2]
        hoist = (ctx is not None and ctx[1] > 1 and n_pix % ctx[1] == 0
                 and n_pix // ctx[1] >= 8)
        if hoist:
            h = frames_to_pixels(h, ctx[0], 1, 2)
        for i in range(4):
            gamma, beta = _GroupNormParams(name=f"norm{i+1}")(h.shape[-1])
            kernel, bias = _TemporalConv3Params(
                self.channels,
                kernel_init=(nn.initializers.zeros if i == 3
                             else nn.initializers.lecun_normal()),
                name=f"conv{i+1}",
            )(h.shape[-1])
            h = groupnorm_silu_temporal_conv3(
                h, gamma, beta, kernel, bias, self.groups, 1e-5, self.dtype,
                pixel_sharded=hoist)
        if hoist:
            h = pixels_to_frames(h, ctx[0], 1, 2)
        return identity + h.reshape(x.shape[:-1] + (h.shape[-1],))


# ---------------------------------------------------------------------------
# Attention / transformer blocks
# ---------------------------------------------------------------------------


class Attention(nn.Module):
    """Multi-head attention with optional PnP Q/K source-substitution,
    optional Q/K transform (rotary), additive bias (T5 rel-pos), and an
    optional IP-Adapter branch (``ip=True`` creates to_k_ip/to_v_ip; image
    tokens attend separately and add scaled output — reference
    ``ip_adapter/attention_processor.py:80-188``).

    Sublane-unaligned head dims (the checkpoint-true i2vgen-xl heads=64
    split: head_dim C/64 in {5, 10, 20}) are stored PADDED in the projection
    weights — to_q/to_k/to_v grow zero output columns per head and to_out
    grows zero input rows (``ops.attention.padded_head_dim``), so activations
    are born lane-aligned and no runtime pad/slice tensors exist. The softmax
    scale always comes from the TRUE head dim, making the padded math exact;
    the weight converter zero-fills the same positions."""

    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None  # None -> self-attention module
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 3
    ip: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        inject: Optional[jax.Array] = None,
        qk_transform: Optional[Callable[[jax.Array, bool], jax.Array]] = None,
        bias: Optional[jax.Array] = None,
        ip_tokens: Optional[jax.Array] = None,   # [B, N_ip, D_ctx]
        ip_scale: float = 1.0,
        frame_axis: bool = False,   # x is [B, S, HW, C]; attend over S (axis 1)
        pixel_sharded: bool = False,  # manual-SPMD: caller already resharded
    ) -> jax.Array:
        dh_store = padded_head_dim(self.head_dim)
        inner = self.heads * dh_store
        scale = float(self.head_dim) ** -0.5
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context
        if dh_store != self.head_dim:
            # rotary pairs features (i, i + dh/2) within each TRUE head —
            # padded storage would re-pair across the zero columns
            assert qk_transform is None, \
                "qk_transform is incompatible with padded head storage"

        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(ctx)

        if inject is not None:
            # reference pnp_utils.py:189-196 — Q and K only, never V
            q = inject_source_rows(q, inject, self.pnp_chunks)
            k = inject_source_rows(k, inject, self.pnp_chunks)

        if qk_transform is not None:
            q = qk_transform(q, True)
            k = qk_transform(k, False)

        if frame_axis:
            # temporal tokens in their module-native 4D layout (no transpose)
            assert bias is None and context is None and not self.ip
            out = temporal_attention(q, k, v, heads=self.heads, scale=scale,
                                     pixel_sharded=pixel_sharded)
            return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)

        out = multi_head_attention(q, k, v, heads=self.heads, bias=bias,
                                   scale=scale)

        if self.ip and ip_tokens is not None:
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip_tokens.astype(self.dtype))
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip_tokens.astype(self.dtype))
            out = out + ip_scale * multi_head_attention(q, k_ip, v_ip,
                                                        heads=self.heads,
                                                        scale=scale)

        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class _DenseParams(nn.Module):
    """Parameter shell with nn.Dense's exact tree ({kernel, bias}), init
    distributions and shapes — lets the owner compute with the raw arrays
    (fused kernels) while converted checkpoints keep loading unchanged."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers default for these UNets).

    On TPU, shapes with many rows run as one fused Pallas kernel
    (:mod:`anyv2v_tpu.ops.pallas_ffn`) that keeps the [N, 2*4C] gate
    intermediate in VMEM instead of round-tripping it through HBM (the
    dominant non-conv HBM traffic of a UNet step — PERF.md round 4)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    activation: str = "geglu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.pallas_ffn import ffn_is_fused, fused_ffn

        dim = x.shape[-1]
        inner = dim * self.mult
        p = inner * 2 if self.activation == "geglu" else inner
        if self.activation not in ("geglu", "gelu"):
            raise ValueError(self.activation)
        w1, b1 = _DenseParams(p, name="proj_in")(dim)
        w2, b2 = _DenseParams(dim, name="proj_out")(inner)

        n_rows = int(np.prod(x.shape[:-1]))
        if ffn_is_fused(n_rows, dim, self.mult,
                        itemsize=jnp.dtype(self.dtype).itemsize):
            return fused_ffn(
                x.astype(self.dtype), w1.astype(self.dtype),
                b1.astype(self.dtype), w2.astype(self.dtype),
                b2.astype(self.dtype), activation=self.activation,
            )

        # unfused path (CPU mesh, narrow shapes): same math as nn.Dense
        # chains — exact (erf) gelu, NOT flax's tanh approximation
        x, w1, b1, w2, b2 = (a.astype(self.dtype) for a in (x, w1, b1, w2, b2))
        h = x @ w1 + b1
        if self.activation == "geglu":
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        else:
            h = nn.gelu(h, approximate=False)
        return h @ w2 + b2


class BasicTransformerBlock(nn.Module):
    """norm1 -> attn1(self) -> norm2 -> attn2(cross) -> norm3 -> ff.

    ``inject`` reaches attn1 only (the reference registers PnP processors on
    ``attn1`` exclusively — ``pnp_utils.py:235-243``)."""

    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    only_self_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 3
    ip: bool = False   # IP-Adapter branch on attn2 (target blocks only)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        inject: Optional[jax.Array] = None,
        qk_transform: Optional[Callable] = None,
        bias: Optional[jax.Array] = None,
        ip_tokens: Optional[jax.Array] = None,
        ip_scale: float = 1.0,
        frame_axis: bool = False,
        pixel_sharded: bool = False,
    ) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(
            self.heads, self.head_dim, dtype=self.dtype, pnp_chunks=self.pnp_chunks,
            name="attn1",
        )(h, inject=inject, qk_transform=qk_transform, bias=bias,
          frame_axis=frame_axis, pixel_sharded=pixel_sharded)

        if not self.only_self_attention:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
            x = x + Attention(
                self.heads,
                self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                ip=self.ip,
                name="attn2",
            )(h, context=context, ip_tokens=ip_tokens, ip_scale=ip_scale,
              frame_axis=frame_axis, pixel_sharded=pixel_sharded)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel over [(B·F), H, W, C]: groupnorm ->
    1x1-conv proj_in -> blocks on flattened tokens -> proj_out -> residual."""

    heads: int
    head_dim: int
    depth: int = 1
    cross_attention_dim: Optional[int] = None
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 3
    ip: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        inject: Optional[jax.Array] = None,
        ip_tokens: Optional[jax.Array] = None,
        ip_scale: float = 1.0,
    ) -> jax.Array:
        b, h_, w_, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h.astype(self.dtype))
        h = h.reshape(b, h_ * w_, inner)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads,
                self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                pnp_chunks=self.pnp_chunks,
                ip=self.ip,
                name=f"blocks_{i}",
            )(h, context=context, inject=inject, ip_tokens=ip_tokens,
              ip_scale=ip_scale)
        h = h.reshape(b, h_, w_, inner)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class TemporalTransformer(nn.Module):
    """diffusers TransformerTemporalModel over [B, F, H, W, C]: tokens are
    frames per (batch, pixel); groupnorm -> linear proj_in -> blocks ->
    linear proj_out -> residual.

    Layout: the plain path (context/rotary/bias) transposes tokens to
    [(B H W), F, C]. The common path (self-attention only — every i2vgen
    call site) keeps the module-native [B, F, HW, C] layout end to end:
    norms/denses are per-token either way, and the strided pallas kernel
    attends over the frame axis in place, deleting two full-tensor
    transposes per module (~13% of a UNet step, measured round 3)."""

    heads: int
    head_dim: int
    depth: int = 1
    cross_attention_dim: Optional[int] = None
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    pnp_chunks: int = 3

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        inject: Optional[jax.Array] = None,
        qk_transform: Optional[Callable] = None,
        bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, f, h_, w_, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(
            x.reshape(b * f, h_, w_, c)
        ).astype(self.dtype)
        frame_axis = context is None and qk_transform is None and bias is None
        pixel_sharded = False
        ctx_manual = None
        if frame_axis:
            h = h.reshape(b, f, h_ * w_, c)                 # free reshape
            # manual-SPMD region: ONE all_to_all to pixel sharding at the
            # module boundary covers the whole transformer (norm/proj/FF are
            # token-local; the frame attention then holds all frames
            # locally), reversed before the residual add — vs one reshard
            # per q/k/v/out inside the attention op
            from ..parallel.mesh import (current_manual_axis,
                                         frames_to_pixels, pixels_to_frames)

            ctx_manual = current_manual_axis()
            n_pix = h_ * w_
            pixel_sharded = (ctx_manual is not None and ctx_manual[1] > 1
                             and n_pix % ctx_manual[1] == 0
                             and n_pix // ctx_manual[1] >= 8)
            if pixel_sharded:
                h = frames_to_pixels(h, ctx_manual[0], 1, 2)
        else:
            # [(B F), H, W, C] -> [(B H W), F, C]
            h = h.reshape(b, f, h_ * w_, c).transpose(0, 2, 1, 3).reshape(
                b * h_ * w_, f, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads,
                self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                pnp_chunks=self.pnp_chunks,
                name=f"blocks_{i}",
            )(h, context=context, inject=inject, qk_transform=qk_transform,
              bias=bias, frame_axis=frame_axis, pixel_sharded=pixel_sharded)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        if frame_axis:
            if pixel_sharded:
                h = pixels_to_frames(h, ctx_manual[0], 1, 2)
            h = h.reshape(b, f, h_, w_, c)
        else:
            h = h.reshape(b, h_ * w_, f, c).transpose(0, 2, 1, 3).reshape(
                b, f, h_, w_, c)
        return h + residual


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


class Downsample2D(nn.Module):
    """Strided 3x3 conv. ``asymmetric_pad`` replicates the diffusers VAE
    encoder (Downsample2D with padding=0 plus an explicit F.pad (0,1,0,1) —
    right/bottom only); the UNets use symmetric padding=1."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    asymmetric_pad: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else 1
        return nn.Conv(self.channels, (3, 3), strides=2, padding=pad, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # nearest-2x as broadcast+reshape: jax.image.resize lowers to a
        # gather that costs ~3x the equivalent copies on TPU (measured)
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


def adaptive_avg_pool_2d(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch ``AdaptiveAvgPool2d`` for channels-last [B, H, W, C].

    Exact reshape-mean when evenly divisible (the 64x64 -> 32x32 case at
    512^2 latents); area-resize approximation otherwise (non-divisible bins
    only occur at exotic resolutions)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, oh, ow, c), "linear")


def fold_frames(x: jax.Array) -> jax.Array:
    """[B, F, H, W, C] -> [(B F), H, W, C]"""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c)


def unfold_frames(x: jax.Array, num_frames: int) -> jax.Array:
    """[(B F), H, W, C] -> [B, F, H, W, C]"""
    bf, h, w, c = x.shape
    return x.reshape(bf // num_frames, num_frames, h, w, c)
